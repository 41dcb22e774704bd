"""Planar-search kernel cost vs k / coords / seed-bound, honest barriers.

Separates the three in-kernel cost families at ICF scan scale:
  - distance compute (k-independent)
  - k extraction+merge passes (linear in k)
  - coordinate selection MXU one-hots (linear in k, only with_coords)
and the effect of a warm seed bound on visit count.

Run: python scripts/knn_k_scaling_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from loam_tpu.profiling import device_time


def main():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.ops.knn_pallas import (
        knn_prep, knn_run, window_candidates, seed_bound_from_window,
    )
    from loam_tpu.registration.icf import azimuth_sort_features

    print("devices:", jax.devices(), flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    reg = RegistrationParams()
    scans, _ = render_trajectory(
        lidar, 2, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    fs0 = azimuth_sort_features(
        extract_features(scans[0], lidar, FeatureExtractionParams()))
    fs1 = azimuth_sort_features(
        extract_features(scans[1], lidar, FeatureExtractionParams()))
    q = fs1.planar_points
    qm = fs1.planar_mask
    t = fs0.planar_points
    tm = fs0.planar_mask
    r = float(reg.max_plane_neighbor_dist)
    Q = q.shape[0]
    print("planar Q:", Q, "valid", int(qm.sum()), flush=True)

    def mk(k, with_coords, seeded):
        def fn(x):
            prep = knn_prep(t, tm)
            win = window_candidates(t, tm, Q) if seeded else None

            def step(carry, _):
                qq = q + carry * 1e-30
                bound = (
                    seed_bound_from_window(qq, *win, k) if seeded else None
                )
                res = knn_run(prep, qq, k, r, with_coords=with_coords,
                              query_mask=qm, seed_bound=bound)
                leaves = [l for l in jax.tree.leaves(res)
                          if jnp.issubdtype(l.dtype, jnp.floating)]
                nxt = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0))
                          for l in leaves)
                return nxt.astype(carry.dtype), ()

            c, _ = lax.scan(step, x, None, length=8)
            return c

        return fn

    for seeded in (False, True):
        for k in (1, 2, 3, 5, 8):
            for wc in (True, False):
                fn = mk(k, wc, seeded)
                dt = device_time(fn, jnp.zeros((), jnp.float32),
                                 n_inner=1, reps=3)
                print(f"seed={int(seeded)} k={k} coords={int(wc)}: "
                      f"{dt/8*1e3:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
