"""One-process A/B: hoisted kNN target prep vs in-loop (scan-to-map + s2s).

LOAM_ICF_HOIST_KNN is read at trace time, so each variant uses a reg-params
spoiler (min_associations +-1: same graph shape and work, different jit
cache key) to force a fresh trace after flipping the env var. Runs
A (hoist), B (no hoist), A2 (hoist again) to bracket chip drift.
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from loam_tpu import LidarParams, scan_to_map_offline, odometry_offline
    from loam_tpu.odometry.scan_to_map import default_map_reg_params
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    F = 32
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    print("devices:", jax.devices(), flush=True)

    def timed_map(tag, hoist, spoiler, reps=3):
        os.environ["LOAM_ICF_HOIST_KNN"] = "1" if hoist else "0"
        reg = dataclasses.replace(
            default_map_reg_params(), min_associations=100 + spoiler
        )

        def run(i):
            _, traj, _ = scan_to_map_offline(
                scans + jnp.float32(1e-6) * i, lidar, reg_params=reg
            )
            return float(jnp.sum(traj.translation))

        run(0)
        t0 = time.perf_counter()
        for i in range(reps):
            run(i + 1)
        dt = time.perf_counter() - t0
        print(f"scan_to_map {tag:20s} {F*reps/dt:8.1f} scans/s", flush=True)

    timed_map("hoist=1", True, 0)
    timed_map("hoist=0", False, 1)
    timed_map("hoist=1 (repeat)", True, 2)


if __name__ == "__main__":
    main()
