"""In-process A/B of scan-to-map variants + scan-to-scan regression check.

Session-to-session throughput on the remote chip varies ~15%, so variants
must be compared back-to-back in ONE process. Runs:
  1. scan-to-map offline, extraction inside the sequential loop
  2. scan-to-map offline, extraction hoisted/batched (current default)
  3. scan-to-scan offline (kernel-regression check for kNN changes)
Also a DENSE-map registration microbench (the 32-frame bench map holds only
~7k points; culling differences only show at real map densities).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(name, fn, frames, reps=3):
    """fn(i) must make rep i's dispatch UNIQUE (perturb the input): the
    remote runtime dedupes identical dispatches, so un-perturbed timing
    loops measure nothing (see loam_tpu/profiling.py)."""
    fn(0)  # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        fn(i + 1)
    dt = time.perf_counter() - t0
    print(f"{name:55s} {frames*reps/dt:8.1f} scans/s", flush=True)


def main():
    from loam_tpu import LidarParams, odometry_offline, scan_to_map_offline
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    F = 32
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    print("devices:", jax.devices(), flush=True)

    def run_map(hoist, i):
        state, traj, details = scan_to_map_offline(
            scans + jnp.float32(1e-6) * i, lidar, hoist_extraction=hoist
        )
        return float(jnp.sum(traj.translation))  # value fetch = real sync

    timed("scan_to_map offline (extract in loop)", lambda i: run_map(False, i), F)
    timed("scan_to_map offline (extract hoisted)", lambda i: run_map(True, i), F)

    F2 = 64
    scans2, _ = render_trajectory(
        lidar, F2, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans2 = jnp.asarray(scans2)

    def run_s2s(i):
        traj, details = odometry_offline(
            scans2 + jnp.float32(1e-6) * i, lidar, chunk_pairs=1
        )
        return float(jnp.sum(traj.translation))  # value fetch = real sync

    timed("scan_to_scan offline (64 frames, chunk=1)", run_s2s, F2)


if __name__ == "__main__":
    main()
