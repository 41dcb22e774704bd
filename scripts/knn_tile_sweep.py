"""Sweep Pallas kNN tile sizes (tq x tt) at scan scale and map scale (TPU).

The active-chunk-list kernel has no in-kernel culling cost, so smaller
target chunks (finer culling granularity) may now win — especially at map
scale where Morton-ordered chunks are compact blobs. Times with the
dispatch-amortized device timer; correctness is asserted against the
current default tiling before timing.

Run: python scripts/knn_tile_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.profiling import device_time


def sweep(name, q, t, tmask, k, max_dist, combos, check_against=None):
    from loam_tpu.ops.knn_pallas import knn_pallas

    print(f"== {name}: Q={q.shape[0]} M={t.shape[0]} "
          f"valid={int(tmask.sum())} k={k} r={max_dist}", flush=True)
    ref = None
    for tq, tt in combos:
        try:
            res = knn_pallas(q, t, tmask, k, max_dist, tq=tq, tt=tt)
            jax.block_until_ready(res.indices)
            if ref is None:
                ref = res
            else:
                # identical semantics across tilings (exact kernel)
                same = bool(
                    jnp.all(res.mask == ref.mask)
                    & jnp.all(jnp.where(res.mask, res.indices, 0)
                              == jnp.where(ref.mask, ref.indices, 0))
                )
                if not same:
                    print(f"  tq={tq:4d} tt={tt:5d}  MISMATCH", flush=True)
                    continue
            dt = device_time(
                lambda qq: knn_pallas(
                    qq, t, tmask, k, max_dist, tq=tq, tt=tt
                ).distances,
                q,
                n_inner=20,
                reps=2,
            )
            print(f"  tq={tq:4d} tt={tt:5d}  {dt*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"  tq={tq:4d} tt={tt:5d}  FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


def main():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.map import voxel_map_empty, voxel_map_insert
    from loam_tpu.geometry import Pose3
    from loam_tpu.odometry.scan_to_map import ScanToMapConfig
    from loam_tpu.registration.icf import (
        azimuth_sort_features, spatial_sort_features
    )

    print("devices:", jax.devices(), flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    reg = RegistrationParams()
    config = ScanToMapConfig()
    F = 24
    scans, gt = render_trajectory(
        lidar, F, step=np.array([0.4, 0.1, 0.0]), yaw_rate=0.02, noise=0.01,
        seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    def pose_of(f):
        R, t = gt[f]
        w = np.sqrt(max(0.0, 1.0 + np.trace(R))) / 2.0
        q = np.array(
            [w, (R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
             (R[1, 0] - R[0, 1]) / (4 * w)], np.float32)
        return Pose3(jnp.asarray(q), jnp.asarray(t, jnp.float32))

    # --- scan scale: azimuth-sorted scan vs azimuth-sorted scan ---
    fs0 = azimuth_sort_features(
        extract_features(scans[0], lidar, FeatureExtractionParams())
    )
    fs1 = azimuth_sort_features(
        extract_features(scans[1], lidar, FeatureExtractionParams())
    )
    combos = [
        (512, 64), (512, 128), (512, 256), (512, 512),
        (1024, 64), (1024, 128), (1024, 256), (1024, 512),
        (2048, 128), (2048, 256), (2048, 512),
    ]
    sweep(
        "scan planar vs scan planar",
        fs1.planar_points, fs0.planar_points, fs0.planar_mask,
        reg.num_plane_neighbors, float(reg.max_plane_neighbor_dist), combos,
    )

    # --- map scale: Morton-sorted scan vs dense Morton voxel map ---
    pmap = voxel_map_empty(config.planar_capacity, config.planar_voxel_size)

    @jax.jit
    def insert(pmap, scan, rot, tr):
        feats = extract_features(scan, lidar, FeatureExtractionParams())
        pw = Pose3(rot, tr).act(feats.planar_points)
        pmap, _ = voxel_map_insert(pmap, pw, feats.planar_mask)
        return pmap

    for f in range(F):
        p = pose_of(f)
        pmap = insert(pmap, scans[f], p.rotation, p.translation)
    jax.block_until_ready(pmap.points)
    print("planar map size:", int(pmap.size), flush=True)

    fsq = spatial_sort_features(
        extract_features(scans[-1], lidar, FeatureExtractionParams())
    )
    qw = pose_of(F - 1).act(fsq.planar_points)
    sweep(
        "scan planar vs planar MAP",
        qw, pmap.points, pmap.mask,
        reg.num_plane_neighbors, float(reg.max_plane_neighbor_dist), combos,
    )


if __name__ == "__main__":
    main()
