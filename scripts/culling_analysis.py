"""Deterministic culling-effectiveness comparison: how many target chunks
must the Pallas kNN kernel visit per query tile, under different
storage/query orderings?

The kernel's work is ~proportional to sum over tiles of |active chunks|
(chunk bbox within radius of tile bbox). This script computes that count
exactly — no device timing, so no remote-chip variance — for the planar
voxel map at dense occupancy:

  a) raster (x-major) map keys + azimuth-sorted queries   (round-1 layout)
  b) Morton map keys + azimuth-sorted queries
  c) Morton map keys + Morton-sorted queries              (current layout)

Run: python scripts/culling_analysis.py   (CPU is fine)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp


def active_counts(q, t, tvalid, tq=128, tt=512, r=2.0):
    """Mean active chunks per tile for query order q, target order t."""
    Q, M = q.shape[0], t.shape[0]
    qpad = -(-Q // tq) * tq
    mpad = -(-M // tt) * tt
    qp = np.full((qpad, 3), np.nan, np.float32)
    qp[:Q] = q
    tp = np.full((mpad, 3), np.nan, np.float32)
    tp[:M] = np.where(tvalid[:, None], t, np.nan)
    n_tiles, n_chunks = qpad // tq, mpad // tt

    def boxes(p, n, sz):
        c = p.reshape(n, sz, 3)
        lo = np.nanmin(c, axis=1)
        hi = np.nanmax(c, axis=1)
        return np.nan_to_num(lo, nan=3e37), np.nan_to_num(hi, nan=-3e37)

    qlo, qhi = boxes(qp, n_tiles, tq)
    blo, bhi = boxes(tp, n_chunks, tt)
    gap = np.maximum(
        np.maximum(qlo[:, None] - bhi[None], blo[None] - qhi[:, None]), 0.0
    )
    sep2 = np.sum(gap * gap, axis=-1)
    active = sep2 < r * r
    return active.sum(axis=1).mean(), active.sum()


def main():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.map import voxel_map_empty, voxel_map_insert
    from loam_tpu.geometry import Pose3
    from loam_tpu.odometry.scan_to_map import ScanToMapConfig
    from loam_tpu.ops.morton import morton_key

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    config = ScanToMapConfig()
    F = 24
    scans, gt = render_trajectory(
        lidar, F, step=np.array([0.4, 0.1, 0.0]), yaw_rate=0.02, noise=0.01,
        seed=0, dtype=np.float32,
    )

    pmap = voxel_map_empty(config.planar_capacity, config.planar_voxel_size)
    for f in range(F):
        R, t = gt[f]
        w = np.sqrt(max(0.0, 1.0 + np.trace(R))) / 2.0
        q = np.array(
            [w, (R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
             (R[1, 0] - R[0, 1]) / (4 * w)], np.float32)
        pose = Pose3(jnp.asarray(q), jnp.asarray(t, jnp.float32))
        feats = extract_features(
            jnp.asarray(scans[f]), lidar, FeatureExtractionParams()
        )
        pw = pose.act(feats.planar_points)
        pmap, _ = voxel_map_insert(pmap, pw, feats.planar_mask)
    print("planar map size:", int(pmap.size))

    tpts = np.asarray(pmap.points)
    tmask = np.asarray(pmap.mask)

    # Current map storage is Morton-key sorted (voxel_map_insert). Rebuild a
    # raster-ordered copy for the round-1 comparison.
    valid = tmask
    half = 0.5 * 1024 * config.planar_voxel_size
    c = np.clip(
        np.floor((tpts + half) / config.planar_voxel_size).astype(np.int64),
        0, 1023,
    )
    raster = (c[:, 0] * 1024 + c[:, 1]) * 1024 + c[:, 2]
    raster[~valid] = np.iinfo(np.int64).max
    t_raster = tpts[np.argsort(raster, kind="stable")]
    tm_raster = np.sort(~valid, kind="stable") == False  # noqa: E712

    mkey = np.asarray(morton_key(jnp.asarray(tpts), config.planar_voxel_size))
    mkey = np.where(valid, mkey, np.iinfo(np.int32).max)
    t_morton = tpts[np.argsort(mkey, kind="stable")]

    feats = extract_features(
        jnp.asarray(scans[-1]), lidar, FeatureExtractionParams()
    )
    qmask = np.asarray(feats.planar_mask)
    qpts = np.asarray(feats.planar_points)
    R, t = gt[-1]
    qw = qpts @ R.T + t
    qw = qw[qmask]

    az = np.argsort(np.arctan2(qw[:, 1], qw[:, 0]), kind="stable")
    q_az = qw[az]
    qm = np.asarray(morton_key(jnp.asarray(qw), 1.0))
    q_morton = qw[np.argsort(qm, kind="stable")]

    tvalid_sorted = np.concatenate(
        [np.ones(int(valid.sum()), bool),
         np.zeros(len(valid) - int(valid.sum()), bool)]
    )
    r = float(config.reg_max_plane_dist) if hasattr(
        config, "reg_max_plane_dist") else 2.0
    for name, qq, tt_ in [
        ("raster map + azimuth queries (round-1)", q_az, t_raster),
        ("morton map + azimuth queries", q_az, t_morton),
        ("morton map + morton queries (current)", q_morton, t_morton),
    ]:
        mean_act, total = active_counts(qq, tt_, tvalid_sorted, r=r)
        print(f"{name:45s} mean active chunks/tile {mean_act:8.1f}  "
              f"total {total}")


if __name__ == "__main__":
    main()
