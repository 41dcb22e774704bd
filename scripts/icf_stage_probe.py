"""Marginal DEVICE cost of each ICF body stage, measured inside ONE jit.

The generic ``device_time`` harness at n_inner=10 still carries ~3 ms/call
of remote-dispatch inflation (one ~30 ms dispatch amortized over 10 inner
calls), which swamps sub-ms stages. Here every probe chains N=50 iterations
of a stage-subset of the REAL ICF body (hoisted kNN prep, packed-coordinate
fits, unrolled LM) inside one ``lax.scan``, vmapped over C pairs — the same
shape the bench's lockstep chunks run. Subtracting successive subsets gives
the marginal cost of each stage with dispatch noise ~0.6 us/call.

Run: python scripts/icf_stage_probe.py [C] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.geometry import Pose3, quat_multiply, quat_normalize, quat_rotate
    from loam_tpu.registration.icf import azimuth_sort_features
    from loam_tpu.registration.associate import associate_edges, associate_planes
    from loam_tpu.registration.solver import _Problem, lm_solve
    from loam_tpu.ops.knn_pallas import knn_prep, knn_run

    print("devices:", jax.devices(), "C =", C, "N =", N, flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    feat_params = FeatureExtractionParams()
    reg = RegistrationParams()
    scans, _ = render_trajectory(
        lidar, C + 1, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    feats = jax.vmap(azimuth_sort_features)(
        jax.vmap(lambda x: extract_features(x, lidar, feat_params))(scans)
    )
    src = jax.tree.map(lambda x: x[1:], feats)
    tgt = jax.tree.map(lambda x: x[:-1], feats)

    def timed(name, make_body):
        """make_body(src_one, tgt_one) -> body(est) -> new est (Pose3).

        The est carry makes each iteration depend on the last (no CSE), and
        prep hoisting happens naturally: make_body closes over tgt prep.
        """

        def one_pair(s, t):
            body = make_body(s, t)

            def step(est, _):
                return body(est), ()

            est0 = Pose3.identity(jnp.float32)
            est, _ = lax.scan(step, est0, None, length=N)
            return est.translation

        from loam_tpu.profiling import force, _roundtrip_s

        f = jax.jit(lambda s, t: jax.vmap(one_pair)(s, t))
        force(f(src, tgt))  # compile + drain
        rt = _roundtrip_s()
        reps = 3
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = f(src, tgt)
        force(out)
        dt = (time.perf_counter() - t0 - rt) / (reps * N)
        print(f"{name:52s} {dt*1000:9.3f} ms/iter (C={C})", flush=True)
        return dt

    def nudge(est, vecs):
        """Fold a data-dependent ~0 update into the carried pose."""
        s = sum(jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0)) for v in vecs)
        eps = s * 1e-30
        return Pose3(est.rotation, est.translation + eps)

    # --- act only -----------------------------------------------------------
    def mk_act(s, t):
        def body(est):
            qe = est.act(s.edge_points)
            qp = est.act(s.planar_points)
            return nudge(est, [qe, qp])
        return body

    t_act = timed("act(edge)+act(planar)", mk_act)

    # --- + both kNN (hoisted prep, with coords) -----------------------------
    def mk_knn(s, t):
        e_prep = knn_prep(t.edge_points, t.edge_mask)
        p_prep = knn_prep(t.planar_points, t.planar_mask)

        def body(est):
            qe = est.act(s.edge_points)
            qp = est.act(s.planar_points)
            e = knn_run(e_prep, qe, reg.num_edge_neighbors,
                        reg.max_edge_neighbor_dist, with_coords=True,
                        query_mask=s.edge_mask)
            p = knn_run(p_prep, qp, reg.num_plane_neighbors,
                        reg.max_plane_neighbor_dist, with_coords=True,
                        query_mask=s.planar_mask)
            return nudge(est, [e.xs, p.xs])
        return body

    t_knn = timed("+ kNN edge + kNN planar (packed)", mk_knn)

    # --- + fits (associate) --------------------------------------------------
    def mk_fit(s, t):
        e_prep = knn_prep(t.edge_points, t.edge_mask)
        p_prep = knn_prep(t.planar_points, t.planar_mask)

        def body(est):
            qe = est.act(s.edge_points)
            qp = est.act(s.planar_points)
            e = knn_run(e_prep, qe, reg.num_edge_neighbors,
                        reg.max_edge_neighbor_dist, with_coords=True,
                        query_mask=s.edge_mask)
            p = knn_run(p_prep, qp, reg.num_plane_neighbors,
                        reg.max_plane_neighbor_dist, with_coords=True,
                        query_mask=s.planar_mask)
            ea = associate_edges(qe, s.edge_mask, t.edge_points, t.edge_mask,
                                 reg, knn_result=e)
            pa = associate_planes(qp, s.planar_mask, t.planar_points,
                                  t.planar_mask, reg, knn_result=p)
            return nudge(est, [ea.line_a, pa.normal])
        return body

    t_fit = timed("+ fits (associate_edges/planes)", mk_fit)

    # --- + lm_solve + compose (full body sans detail) ------------------------
    def mk_solve(s, t):
        e_prep = knn_prep(t.edge_points, t.edge_mask)
        p_prep = knn_prep(t.planar_points, t.planar_mask)

        def body(est):
            qe = est.act(s.edge_points)
            qp = est.act(s.planar_points)
            e = knn_run(e_prep, qe, reg.num_edge_neighbors,
                        reg.max_edge_neighbor_dist, with_coords=True,
                        query_mask=s.edge_mask)
            p = knn_run(p_prep, qp, reg.num_plane_neighbors,
                        reg.max_plane_neighbor_dist, with_coords=True,
                        query_mask=s.planar_mask)
            ea = associate_edges(qe, s.edge_mask, t.edge_points, t.edge_mask,
                                 reg, knn_result=e)
            pa = associate_planes(qp, s.planar_mask, t.planar_points,
                                  t.planar_mask, reg, knn_result=p)
            prob = _Problem(pts_edge=qe, edge=ea, pts_plane=qp, plane=pa,
                            prior_offset=Pose3.identity(jnp.float32))
            delta, cost = lm_solve(prob, reg)
            return Pose3(
                quat_normalize(quat_multiply(delta.rotation, est.rotation)),
                quat_rotate(delta.rotation, est.translation)
                + delta.translation * (1.0 + cost * 1e-30),
            )
        return body

    t_full = timed("+ lm_solve + compose (full body)", mk_solve)

    print(f"\nmarginals per body iteration (C={C}):", flush=True)
    print(f"  act:        {t_act*1000:8.3f} ms")
    print(f"  kNN:        {(t_knn-t_act)*1000:8.3f} ms")
    print(f"  fits:       {(t_fit-t_knn)*1000:8.3f} ms")
    print(f"  lm+compose: {(t_full-t_fit)*1000:8.3f} ms")
    print(f"  full body:  {t_full*1000:8.3f} ms  "
          f"({t_full/C*1000:.3f} ms/pair/iter)")


if __name__ == "__main__":
    main()
