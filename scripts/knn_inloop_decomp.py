"""Decompose the in-loop (vmapped C-pair) kNN cost: edge kernel, planar
kernel, and the per-iteration XLA glue, all within ONE process so session
noise cancels.

Arms (all vmapped over C pairs, 8 lockstep iterations, honest barrier):
  both        — production shape: edge + planar searches
  planar-only — edge search removed
  edge-only   — planar search removed
  glue-only   — both searches with the pallas_call replaced by a
                shape-correct dummy (init values): times act/pad/transpose/
                boxes/gaps/lists/output-unpack without kernel execution

Run: python scripts/knn_inloop_decomp.py [C]
"""

import functools
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from loam_tpu.profiling import device_time


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.registration.icf import azimuth_sort_features

    kp = importlib.import_module("loam_tpu.ops.knn_pallas")

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

    real_call = kp.pl.pallas_call

    def dummy_pallas_call(kernel, **kw):
        out_shape = kw["out_shape"]

        def run(*operands):
            return [jnp.zeros(s.shape, s.dtype) for s in out_shape]

        return run

    def body(use_edge, use_planar, dummy):
        if dummy:
            kp.pl.pallas_call = dummy_pallas_call
        else:
            kp.pl.pallas_call = real_call

        def one(s, t):
            ep = kp.knn_prep(t.edge_points, t.edge_mask)
            pp = kp.knn_prep(t.planar_points, t.planar_mask)

            def step(carry, _):
                d = carry * 1e-30
                outs = []
                if use_edge:
                    outs.append(kp.knn_run(
                        ep, s.edge_points + d, reg.num_edge_neighbors,
                        reg.max_edge_neighbor_dist, with_coords=True,
                        query_mask=s.edge_mask))
                if use_planar:
                    outs.append(kp.knn_run(
                        pp, s.planar_points + d, reg.num_plane_neighbors,
                        reg.max_plane_neighbor_dist, with_coords=True,
                        query_mask=s.planar_mask))
                leaves = [l for l in jax.tree.leaves(outs)
                          if jnp.issubdtype(l.dtype, jnp.floating)]
                nxt = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0))
                          for l in leaves)
                return nxt.astype(carry.dtype), ()

            c, _ = lax.scan(step, jnp.zeros((), jnp.float32), None, length=8)
            return c

        fn = lambda x: jax.vmap(one)(
            jax.tree.map(
                lambda a: a + x * 0
                if jnp.issubdtype(a.dtype, jnp.floating) else a, src),
            tgt,
        )
        dt = device_time(fn, jnp.zeros((), jnp.float32), n_inner=1, reps=3)
        kp.pl.pallas_call = real_call
        return dt / 8 / C * 1e3

    for label, ue, upl, dm in [
        ("both", True, True, False),
        ("planar-only", False, True, False),
        ("edge-only", True, False, False),
        ("glue-only", True, True, True),
    ]:
        ms = body(ue, upl, dm)
        print(f"{label:12s} {ms:7.3f} ms/pair/iter", flush=True)


if __name__ == "__main__":
    main()
