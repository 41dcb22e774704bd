"""Honest (forced-barrier) timing of the kNN work exactly as the ICF loop
issues it: hoisted prep, with_coords packed output, query_mask, vmapped over
C pairs, both edge and planar searches per iteration.

All pre-fix sweeps (broken block_until_ready) are superseded by this probe.
Run: python scripts/knn_icf_probe.py [C]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.registration.icf import azimuth_sort_features
    from loam_tpu.ops.knn_pallas import knn_prep, knn_run
    from loam_tpu.profiling import device_time

    print("devices:", jax.devices(), "C =", C, flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    reg = RegistrationParams()
    scans, _ = render_trajectory(
        lidar, C + 1, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    fs = [
        azimuth_sort_features(
            extract_features(scans[i], lidar, FeatureExtractionParams())
        )
        for i in range(C + 1)
    ]
    stack = lambda xs: jax.tree.map(lambda *l: jnp.stack(l), *xs)
    src = stack(fs[1:])
    tgt = stack(fs[:-1])
    print("edge slots:", src.edge_points.shape, "planar:", src.planar_points.shape,
          "valid e/p:", int(fs[0].edge_mask.sum()), int(fs[0].planar_mask.sum()),
          flush=True)

    def body_knn(with_coords, tq=None, tt=None):
        def one(s, t):
            ep = knn_prep(t.edge_points, t.edge_mask, tt=tt)
            pp = knn_prep(t.planar_points, t.planar_mask, tt=tt)

            def step(carry, _):
                d = carry * 1e-30
                eq = s.edge_points + d
                pq = s.planar_points + d
                er = knn_run(ep, eq, reg.num_edge_neighbors,
                             reg.max_edge_neighbor_dist, tq=tq,
                             with_coords=with_coords, query_mask=s.edge_mask)
                pr = knn_run(pp, pq, reg.num_plane_neighbors,
                             reg.max_plane_neighbor_dist, tq=tq,
                             with_coords=with_coords, query_mask=s.planar_mask)
                leaves = [l for l in jax.tree.leaves((er, pr))
                          if jnp.issubdtype(l.dtype, jnp.floating)]
                nxt = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0)) for l in leaves)
                return nxt.astype(carry.dtype), ()

            c, _ = lax.scan(step, jnp.zeros((), jnp.float32), None, length=8)
            return c

        def perturb(a, x):
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a + x * 0
            return a

        return lambda x: jax.vmap(one)(
            jax.tree.map(lambda a: perturb(a, x), src), tgt
        )

    for (tq, tt) in [(None, None), (1024, 256), (512, 128), (512, 256),
                     (1024, 128), (2048, 256), (256, 128)]:
        for wc in (True, False):
            fn = body_knn(wc, tq, tt)
            dt = device_time(fn, jnp.zeros((), jnp.float32), n_inner=1, reps=3)
            label = f"tq={tq} tt={tt} coords={int(wc)}"
            print(f"{label:38s} {dt/8*1e3:8.3f} ms/iter ({dt/8/C*1e3:6.3f} ms/pair)",
                  flush=True)


if __name__ == "__main__":
    main()
