"""Per-stage DEVICE timing of the scan-to-map path at map scale (TPU).

Same methodology as scripts/profile_stages.py (dispatch-amortized,
CSE-proof device_time). Builds a densely populated map (many frames of
world-frame features inserted without keyframe gating), then times:
map-scale kNN (edge map 1<<15, planar map 1<<17 slots), the association
neighbor gather, voxel_map_insert, and the full scan_to_map_step.
Run: python scripts/profile_map_stages.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.profiling import device_time as _device_time


def device_time(name, fn, *args, n=10):
    dt = _device_time(fn, *args, n_inner=n, reps=2)
    print(f"{name:50s} {dt*1000:10.3f} ms", flush=True)
    return dt


def _quat_from_matrix(R):
    """Rotation matrix -> unit quaternion (w, x, y, z), numpy."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # not hit for small-yaw trajectories
        x, y, z = 1.0, 0.0, 0.0
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def main():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.map import voxel_map_empty, voxel_map_insert
    from loam_tpu.ops.knn_pallas import knn_pallas
    from loam_tpu.geometry import Pose3
    from loam_tpu.odometry.scan_to_map import (
        ScanToMapConfig,
        default_map_reg_params,
        scan_to_map_init,
        scan_to_map_step,
    )
    from loam_tpu.registration.icf import azimuth_sort_features

    print("devices:", jax.devices(), flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    config = ScanToMapConfig()
    reg = default_map_reg_params()
    F = 24
    scans, gt = render_trajectory(
        lidar, F, step=np.array([0.4, 0.1, 0.0]), yaw_rate=0.02, noise=0.01,
        seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    # Populate the maps densely: every frame's world-frame features inserted
    # (no keyframe gating), mimicking a long mapping run near capacity.
    emap = voxel_map_empty(config.edge_capacity, config.edge_voxel_size)
    pmap = voxel_map_empty(config.planar_capacity, config.planar_voxel_size)

    @jax.jit
    def insert_frame(emap, pmap, scan, q, t):
        feats = extract_features(scan, lidar, FeatureExtractionParams())
        pose = Pose3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))
        ew = pose.act(feats.edge_points)
        pw = pose.act(feats.planar_points)
        emap, _ = voxel_map_insert(emap, ew, feats.edge_mask)
        pmap, _ = voxel_map_insert(pmap, pw, feats.planar_mask)
        return emap, pmap

    for f in range(F):
        R, t = gt[f]
        emap, pmap = insert_frame(emap, pmap, scans[f], _quat_from_matrix(R), t)
    jax.block_until_ready(pmap.points)
    print(
        "map sizes: edge", int(emap.size), "planar", int(pmap.size), flush=True
    )

    feats = azimuth_sort_features(
        extract_features(scans[-1], lidar, FeatureExtractionParams())
    )
    pose_last = Pose3(
        jnp.asarray(_quat_from_matrix(gt[-1][0]), jnp.float32),
        jnp.asarray(gt[-1][1], jnp.float32),
    )
    qe = pose_last.act(feats.edge_points)
    qp = pose_last.act(feats.planar_points)
    ne = int(jnp.sum(feats.edge_mask))
    np_ = int(jnp.sum(feats.planar_mask))
    print(f"  scan features: edges {ne} planars {np_}", flush=True)

    device_time(
        f"knn edges vs edge map ({emap.points.shape[0]} slots)",
        lambda q: knn_pallas(
            q, emap.points, emap.mask, 5, float(reg.max_edge_neighbor_dist)
        ).indices.astype(jnp.float32),
        qe,
    )
    res_p = None

    def knn_planes(q):
        return knn_pallas(
            q, pmap.points, pmap.mask, 5, float(reg.max_plane_neighbor_dist)
        )

    device_time(
        f"knn planes vs planar map ({pmap.points.shape[0]} slots)",
        lambda q: knn_planes(q).indices.astype(jnp.float32),
        qp,
    )
    device_time(
        "neighbor gather (planar map rows)",
        lambda q: pmap.points[knn_planes(q).indices] - qp[:, None, :],
        qp,
    )
    device_time(
        "voxel_map_insert (planar map + scan planars)",
        lambda p: voxel_map_insert(
            pmap, p, feats.planar_mask, pose_last.translation,
            config.keep_radius,
        )[0].points,
        qp,
    )
    device_time(
        "voxel_map_insert (edge map + scan edges)",
        lambda p: voxel_map_insert(
            emap, p, feats.edge_mask, pose_last.translation,
            config.keep_radius,
        )[0].points,
        qe,
    )

    state = scan_to_map_init(config, lidar=lidar)
    state = state._replace(
        edge_map=emap, planar_map=pmap, world_T_current=pose_last,
        frames_since_insert=jnp.int32(1),
    )
    device_time(
        "scan_to_map_step (full, dense map)",
        lambda s: scan_to_map_step(
            state, s, lidar, FeatureExtractionParams(), reg, config
        )[1].translation,
        scans[-1],
        n=5,
    )


if __name__ == "__main__":
    main()
