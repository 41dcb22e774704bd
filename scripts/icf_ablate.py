"""E2E ABLATION of the ICF body: replace one stage at a time with a
shape-preserving dummy inside the REAL _register loop (pinned iteration
count, forced barriers) and diff whole-program device times.

Why: the remote runtime's traces leave while-loop interiors opaque (no
nested op events), and consume-pattern marginal probes mis-attribute
(XLA pipelines differently per consumed output). Whole-program diffs with
identical control flow are the only attribution that holds.

Run: python scripts/icf_ablate.py [C] [ITERS]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    I = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.geometry import Pose3
    from loam_tpu.registration import icf as icf_mod
    from loam_tpu.registration import associate as assoc_mod
    from loam_tpu.registration.detail import RegistrationDetail
    from loam_tpu.profiling import device_time
    import importlib
    knn_mod = importlib.import_module("loam_tpu.ops.knn_pallas")

    print("devices:", jax.devices(), "C =", C, "I =", I, flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    # pin control flow: always run exactly I iterations, never early-exit
    reg = RegistrationParams(
        max_iterations=I,
        rotation_convergence_thresh=0.0,
        position_convergence_thresh=0.0,
        min_associations=1,
    )
    scans, _ = render_trajectory(
        lidar, C + 1, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    fs = [extract_features(scans[i], lidar, FeatureExtractionParams())
          for i in range(C + 1)]
    stack = lambda xs: jax.tree.map(lambda *l: jnp.stack(l), *xs)
    src = stack(fs[1:])
    tgt = stack(fs[:-1])

    real_knn_run = knn_mod.knn_run
    real_assoc_e = assoc_mod.associate_edges
    real_assoc_p = assoc_mod.associate_planes
    real_lm = icf_mod.lm_solve

    def fake_knn_run(prep, queries, k, max_dist=0.0, tq=None,
                     with_coords=False, query_mask=None):
        Q = queries.shape[0]
        x = queries[:, 0] * 1.0000001
        xs = jnp.broadcast_to(x[None, :], (k, Q))
        ys = jnp.broadcast_to(queries[:, 1][None, :], (k, Q))
        zs = jnp.broadcast_to(queries[:, 2][None, :], (k, Q))
        mask = jnp.ones((k, Q), bool)
        if query_mask is not None:
            mask = mask & query_mask[None, :]
        return knn_mod.PackedKnn(
            first_idx=jnp.zeros((Q,), jnp.int32), mask=mask,
            xs=xs, ys=ys, zs=zs,
        )

    def fake_assoc(real):
        def f(q, qmask, tpts, tmask, params, knn_result=None, neighbor_pts=None):
            out = real(q, qmask, tpts, tmask, params, knn_result=knn_result,
                       neighbor_pts=neighbor_pts)
            # association result derived ONLY from q (cheap), same pytree
            def mimic(leaf):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    src = q[:, 0].astype(leaf.dtype)
                    n = int(np.prod(leaf.shape)) if leaf.ndim else 1
                    flat = jnp.broadcast_to(
                        src[: max(1, min(len(src), n))][:1], leaf.shape)
                    return flat * 1e-6
                if leaf.dtype == jnp.bool_:
                    return jnp.ones(leaf.shape, bool)
                return jnp.zeros(leaf.shape, leaf.dtype)
            return jax.tree.map(mimic, out)
        return f

    def fake_lm(problem, params):
        d = jnp.sum(problem.pts_edge[:, 0]) * 1e-30
        rot = jnp.array([1.0, 0, 0, 0], jnp.float32) + jnp.zeros(4) * d
        return Pose3(rot, jnp.full((3,), 1e-4, jnp.float32) + d), jnp.asarray(0.0)

    def measure(name, with_matches=True):
        def run(x):
            def one(s, t):
                s2 = dataclasses.replace(s) if dataclasses.is_dataclass(s) else s
                pose, det = icf_mod._register_impl(
                    s2, t, Pose3.identity(jnp.float32), reg, with_matches,
                )
                return pose.translation + x * 0
            return jax.vmap(one)(src, tgt)

        dt = device_time(run, jnp.zeros((), jnp.float32), n_inner=1, reps=3)
        print(f"{name:42s} {dt*1e3:9.3f} ms  ({dt/C/I*1e3:7.4f} ms/pair/iter)",
              flush=True)
        return dt

    t_full = measure("full body")
    knn_mod.knn_run = fake_knn_run
    t_noknn = measure("kNN -> dummy")
    knn_mod.knn_run = real_knn_run

    assoc_mod.associate_edges = fake_assoc(real_assoc_e)
    assoc_mod.associate_planes = fake_assoc(real_assoc_p)
    icf_mod.associate_edges = assoc_mod.associate_edges
    icf_mod.associate_planes = assoc_mod.associate_planes
    t_nofit = measure("fits -> mimic (kNN still real)")
    assoc_mod.associate_edges = real_assoc_e
    assoc_mod.associate_planes = real_assoc_p
    icf_mod.associate_edges = real_assoc_e
    icf_mod.associate_planes = real_assoc_p

    icf_mod.lm_solve = fake_lm
    t_nolm = measure("lm_solve -> dummy")
    icf_mod.lm_solve = real_lm

    t_nomatch = measure("with_matches=False", with_matches=False)

    print(f"\nattribution (C={C}, I={I}):", flush=True)
    print(f"  kNN:            {(t_full-t_noknn)*1e3:9.3f} ms")
    print(f"  fits:           {(t_full-t_nofit)*1e3:9.3f} ms")
    print(f"  lm_solve:       {(t_full-t_nolm)*1e3:9.3f} ms")
    print(f"  match recording:{(t_full-t_nomatch)*1e3:9.3f} ms")
    print(f"  full:           {t_full*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
