"""Decompose feature-extraction cost at e2e batch scale (round 4).

The round-4 e2e stage split showed extraction ~= the ENTIRE e2e time
(extract-only 2.2 ms/scan vs full odometry 2.1-2.5 in the same session) -
the ICF loop adds ~nothing with motion-prior init. This probe attributes
extraction time to its internal stages, all vmapped over a 32-frame batch
as production runs them (precise double-float path, kernels auto-on).

Run: python scripts/extract_stage_probe.py [FRAMES]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.profiling import device_time


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.features.curvature import (
        compute_curvature_df, compute_valid_points_df,
    )
    from loam_tpu.features import extract as ex
    from loam_tpu.registration.icf import azimuth_sort_features

    print("devices:", jax.devices(), "F =", F, flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    params = FeatureExtractionParams()
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    def arm(label, fn):
        dt = device_time(fn, jnp.zeros((), jnp.float32), n_inner=1, reps=3)
        print(f"{label:30s} {dt/F*1e3:8.3f} ms/scan", flush=True)

    def curv_only(x):
        return jax.vmap(
            lambda s: compute_curvature_df(s + x * 0, lidar, params)
        )(scans)

    def valid_only(x):
        return jax.vmap(
            lambda s: compute_valid_points_df(s + x * 0, lidar, params)
        )(scans)

    def to_sorted(x):
        def one(scan):
            pts = scan + x * 0
            c_hi, c_lo = compute_curvature_df(pts, lidar, params)
            valid = compute_valid_points_df(pts, lidar, params)
            L, P = lidar.scan_lines, lidar.points_per_line
            S = params.number_sectors
            pos_all, _, s_max = ex._sector_layout(lidar, params)
            pps = P // S
            curv = c_hi.reshape(L, P)

            def to_sectors(x2d, fill):
                parts = []
                for s in range(S):
                    size = s_max if s == S - 1 else pps
                    sl = jax.lax.slice_in_dim(
                        x2d, s * pps, s * pps + size, axis=1)
                    if size < s_max:
                        sl = jnp.pad(sl, ((0, 0), (0, s_max - size)),
                                     constant_values=fill)
                    parts.append(sl)
                return jnp.stack(parts, axis=1)

            c_all = to_sectors(curv, jnp.inf)
            pos_b = jnp.broadcast_to(pos_all[None], c_all.shape)
            cl = c_lo.reshape(L, P)
            cl = jnp.where(cl == 0, jnp.asarray(0.0, cl.dtype), cl)
            cl_all = to_sectors(cl, 0.0)
            return ex._sector_sort(c_all, cl_all, pos_b, params.sector_sort), valid
        return jax.vmap(one)(scans)

    def full(x):
        return jax.vmap(
            lambda s: extract_features(s + x * 0, lidar, params)
        )(scans)

    def full_sorted(x):
        return jax.vmap(
            lambda s: azimuth_sort_features(
                extract_features(s + x * 0, lidar, params))
        )(scans)

    arm("warmup(full)", full)
    arm("curvature_df", curv_only)
    arm("validity_df", valid_only)
    arm("curv+valid+sector sort", to_sorted)
    arm("full extract", full)
    arm("full + azimuth sort", full_sorted)
    arm("full extract (rep)", full)


if __name__ == "__main__":
    main()
