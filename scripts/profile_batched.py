"""Device timing of the BATCHED (chunked lockstep) pipeline stages on TPU.

Answers "where does a bench chunk's time go": marginal cost per ICF
iteration at chunk batch size C, extraction cost per frame at batch, and the
vmapped Pallas kNN kernels at the bench's real shapes.

Run: python scripts/profile_batched.py [C]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.profiling import device_time as _device_time


def device_time(name, fn, x, *static_args, n=8):
    dt = _device_time(fn, x, *static_args, n_inner=n, reps=2)
    print(f"{name:52s} {dt*1000:10.3f} ms", flush=True)
    return dt


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.registration.icf import _register, azimuth_sort_features
    from loam_tpu.ops.knn_pallas import knn_pallas

    print("devices:", jax.devices(), "C =", C, flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    feat_params = FeatureExtractionParams()
    scans, _ = render_trajectory(
        lidar, C + 1, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    def extract_batch(s):
        return jax.vmap(lambda x: extract_features(x, lidar, feat_params))(s)

    feats = jax.vmap(azimuth_sort_features)(extract_batch(scans))
    device_time(f"extract_features batch F={C+1}", extract_batch, scans)

    src = jax.tree.map(lambda x: x[1:], feats)
    tgt = jax.tree.map(lambda x: x[:-1], feats)
    from loam_tpu.geometry import Pose3

    def reg_batch_iters(iters):
        reg = RegistrationParams(max_iterations=iters)

        def f(src_ep):
            s = src._replace(edge_points=src_ep)
            init = Pose3.identity(jnp.float32, (C,))
            pose, det = jax.vmap(
                lambda a, b, i: _register(
                    a, b, i, reg, with_matches=False, reorder_mode="none"
                )
            )(s, tgt, init)
            return pose.translation

        return f

    t1 = device_time(f"register chunk C={C} max_iter=1",
                     reg_batch_iters(1), src.edge_points, n=4)
    t2 = device_time(f"register chunk C={C} max_iter=2",
                     reg_batch_iters(2), src.edge_points, n=4)
    t4 = device_time(f"register chunk C={C} max_iter=4",
                     reg_batch_iters(4), src.edge_points, n=4)
    print(f"  marginal per outer iteration: {((t4-t1)/3)*1000:.3f} ms "
          f"(2-1: {(t2-t1)*1000:.3f})", flush=True)

    # vmapped pallas kNN at bench shapes
    E = src.edge_points.shape[1]
    Q = src.planar_points.shape[1]
    print(f"  capacities: edges {E}, planars {Q}", flush=True)

    def knn_planes(qp):
        return jax.vmap(
            lambda q, t, m: knn_pallas(q, t, m, 5, 2.0).distances
        )(qp, tgt.planar_points, tgt.planar_mask)

    def knn_edges(qe):
        return jax.vmap(
            lambda q, t, m: knn_pallas(q, t, m, 5, 1.0).distances
        )(qe, tgt.edge_points, tgt.edge_mask)

    device_time(f"knn_pallas planes B={C} ({Q}x{Q})", knn_planes,
                src.planar_points, n=8)
    device_time(f"knn_pallas edges  B={C} ({E}x{E})", knn_edges,
                src.edge_points, n=8)

    # fits + solver at batch
    from loam_tpu.registration.associate import associate_edges, associate_planes
    from loam_tpu.registration.solver import _Problem, lm_solve

    reg = RegistrationParams()

    def assoc_and_solve(qe):
        def one(qe_, em, qp, pm, tep, tem, tpp, tpm):
            ea = associate_edges(qe_, em, tep, tem, reg)
            pa = associate_planes(qp, pm, tpp, tpm, reg)
            prob = _Problem(pts_edge=qe_, edge=ea, pts_plane=qp, plane=pa,
                            prior_offset=Pose3.identity(jnp.float32))
            delta, cost = lm_solve(prob, reg)
            return delta.translation

        return jax.vmap(one)(
            qe, src.edge_mask, src.planar_points, src.planar_mask,
            tgt.edge_points, tgt.edge_mask, tgt.planar_points, tgt.planar_mask,
        )

    device_time(f"associate+fit+lm_solve B={C}", assoc_and_solve,
                src.edge_points, n=4)


if __name__ == "__main__":
    main()
