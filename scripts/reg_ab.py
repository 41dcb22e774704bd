"""In-process A/B of the LM solve kernel (lm_impl xla vs pallas).

Times, back-to-back in ONE process:
  1. single-pair register_features (feature-scale targets), both impls;
  2. end-to-end scan-to-scan odometry, both impls;
  3. end-to-end scan-to-map odometry, both impls.

Correctness gate first: recovered poses must agree to f32 tolerance (the
kernel's reduction order differs — ulp-level, amplified by the ICF loop's
convergence knife-edge, so iteration counts may differ; compare
trajectories, not detail internals).

Run: python scripts/reg_ab.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(name, fn, scans_per_rep, reps=4):
    fn(0)
    t0 = time.perf_counter()
    for i in range(reps):
        fn(i + 1)
    dt = time.perf_counter() - t0
    print(f"{name:55s} {scans_per_rep*reps/dt:8.1f} scans/s"
          f"   ({dt/reps*1e3/scans_per_rep:6.3f} ms/scan)", flush=True)


def main():
    from loam_tpu import (
        LidarParams, extract_features, odometry_offline, scan_to_map_offline,
    )
    from loam_tpu.geometry import Pose3
    from loam_tpu.params import RegistrationParams
    from loam_tpu.registration.icf import _register
    from loam_tpu.odometry.scan_to_map import default_map_reg_params
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    F = 64
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    print("devices:", jax.devices(), flush=True)

    impls = ["xla", "pallas"]

    # 1. single pair
    f0 = extract_features(scans[0], lidar)
    f1 = extract_features(scans[1], lidar)
    poses = {}
    for impl in impls:
        rp = RegistrationParams(lm_impl=impl)
        reg = jax.jit(lambda a, b, rp=rp: _register(
            a, b, Pose3.identity(jnp.float32), rp, with_matches=False))

        def run(i, reg=reg, f1=f1, f0=f0):
            est, det = reg(
                jax.tree.map(
                    lambda x: x + jnp.float32(1e-7) * i
                    if x.dtype == jnp.float32 else x, f1),
                f0)
            return float(jnp.sum(est.translation))

        est, _ = reg(f1, f0)
        poses[impl] = np.asarray(est.translation)
        timed(f"register_features single pair [lm={impl}]", run, 1, reps=8)
    np.testing.assert_allclose(poses["pallas"], poses["xla"], atol=2e-3)
    print("single-pair poses agree", flush=True)

    # 2. scan-to-scan e2e
    trajs = {}
    for impl in impls:
        rp = RegistrationParams(lm_impl=impl)

        def run(i, rp=rp):
            traj, det = odometry_offline(
                scans + jnp.float32(1e-6) * i, lidar, reg_params=rp,
                motion_init=True,
            )
            return float(jnp.sum(traj.translation))

        traj, _ = odometry_offline(scans, lidar, reg_params=rp, motion_init=True)
        trajs[impl] = np.asarray(traj.translation)
        timed(f"odometry_offline e2e [lm={impl}]", run, F)
    drift = np.linalg.norm(trajs["pallas"][-1] - trajs["xla"][-1])
    print(f"final-pose divergence xla vs pallas: {drift:.4f} m "
          f"(knife-edge tolerance ~0.1 m)", flush=True)

    # 3. scan-to-map e2e
    F2 = 32
    for impl in impls:
        rp = dataclasses.replace(default_map_reg_params(), lm_impl=impl)

        def run(i, rp=rp):
            state, traj, det = scan_to_map_offline(
                scans[:F2] + jnp.float32(1e-6) * i, lidar, reg_params=rp
            )
            return float(jnp.sum(traj.translation))

        timed(f"scan_to_map e2e [lm={impl}]", run, F2)


if __name__ == "__main__":
    main()
