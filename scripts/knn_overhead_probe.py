"""Isolate the kNN kernel's control-overhead floor at ICF planar scale.

Arms:
  normal          — production knn_run (k=5, coords, mask)
  gate-closed     — seed_bound=-1: every chunk_work skipped, full visit
                    loop still runs => measures per-visit gate+loop overhead
  empty-lists     — cnt forced 0: fori_loop trips zero times => measures
                    launch + prologue/epilogue only
  all-active      — bbox prefilter disabled (every chunk visited, gate still
                    on) => how much the active-list culling buys

Run: python scripts/knn_overhead_probe.py
"""

import functools
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
    import importlib

    kp = importlib.import_module("loam_tpu.ops.knn_pallas")
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
    k = 5
    Q = q.shape[0]

    real_pack = kp._pack_active_lists

    def run_arm(label, seed_val=None, empty=False, all_active=False):
        if empty:
            kp._pack_active_lists = lambda a, s=None: (
                jnp.zeros_like(real_pack(a, s)[0]),
                jnp.zeros_like(real_pack(a, s)[1]),
            )
        elif all_active:
            kp._pack_active_lists = lambda a, s=None: real_pack(
                jnp.ones_like(a), None
            )
        else:
            kp._pack_active_lists = real_pack

        def fn(x):
            prep = kp.knn_prep(t, tm)

            def step(carry, _):
                qq = q + carry * 1e-30
                bound = (
                    jnp.full((Q,), seed_val, jnp.float32)
                    if seed_val is not None else None
                )
                res = kp.knn_run(prep, qq, k, r, with_coords=True,
                                 query_mask=qm, seed_bound=bound)
                leaves = [l for l in jax.tree.leaves(res)
                          if jnp.issubdtype(l.dtype, jnp.floating)]
                nxt = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0))
                          for l in leaves)
                return nxt.astype(carry.dtype), ()

            c, _ = lax.scan(step, x, None, length=8)
            return c

        dt = device_time(fn, jnp.zeros((), jnp.float32), n_inner=1, reps=3)
        print(f"{label:18s} {dt/8*1e3:7.3f} ms/call", flush=True)
        kp._pack_active_lists = real_pack

    # visit statistics first
    prep = kp.knn_prep(t, tm)
    res, visits = kp.knn_run(prep, q, k, r, with_coords=True, query_mask=qm,
                             return_visits=True)
    v = np.asarray(visits)
    print(f"executed chunk_works/tile: {v.tolist()}  total={v.sum()}",
          flush=True)

    run_arm("normal")
    run_arm("gate-closed", seed_val=-1.0)
    run_arm("empty-lists", empty=True)
    run_arm("all-active", all_active=True)


if __name__ == "__main__":
    main()
