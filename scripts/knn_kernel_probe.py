"""Decompose Pallas kNN kernel cost on TPU: which part eats the time?

Roofline says scan-scale planar kNN should be ~0.3-0.5 ms; measured ~2.5 ms.
Probes (all at the auto-tile defaults):
  - k sweep (1, 2, 5): if time ~ linear in k, the per-pass top-k extraction
    dominates; if flat, per-chunk overhead / memory movement dominates.
  - radius off (full chunk loop, no lists): bounds the list-loop overhead.
  - LOAM_KNN_UNROLL sweep happens via env in separate invocations.

Run: python scripts/knn_kernel_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.profiling import device_time


def main():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.ops.knn_pallas import knn_pallas
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
        extract_features(scans[0], lidar, FeatureExtractionParams())
    )
    fs1 = azimuth_sort_features(
        extract_features(scans[1], lidar, FeatureExtractionParams())
    )
    q = fs1.planar_points
    t = fs0.planar_points
    tm = fs0.planar_mask
    r = float(reg.max_plane_neighbor_dist)

    def time_case(name, **kw):
        dt = device_time(
            lambda qq: knn_pallas(qq, t, tm, **kw).distances,
            q, n_inner=20, reps=2,
        )
        print(f"{name:45s} {dt*1e3:8.3f} ms", flush=True)

    for k in (1, 2, 5):
        time_case(f"planar k={k} r={r} (lists)", k=k, max_dist=r)
    time_case("planar k=5 r=0 (full loop, no radius)", k=5, max_dist=0.0)
    # edge-scale for reference
    qe, te, tme = fs1.edge_points, fs0.edge_points, fs0.edge_mask
    dt = device_time(
        lambda qq: knn_pallas(
            qq, te, tme, 5, float(reg.max_edge_neighbor_dist)
        ).distances,
        qe, n_inner=20, reps=2,
    )
    print(f"{'edge k=5 (lists)':45s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
