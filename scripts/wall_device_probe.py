"""Attribute the wall-vs-device gap of the batch benches (VERDICT r4 #5).

Round-4 numbers: device_time says ~1.35 ms/scan for scan-to-scan odometry;
the bench wall says 1.73-1.77 — a ~0.4 ms/scan (~22%) gap on the
tunnel-attached chip. This probe separates the gap into
  (a) a FIXED per-measurement cost (final force round-trip + first-dispatch
      latency), amortized as reps grow, and
  (b) a PER-REP cost (host re-dispatch of the whole program between reps),
      constant in reps,
by sweeping the enqueued-rep count R with one true barrier at the end —
wall/scan(R) = device + fixed/(R*F) + per_rep/F. Uses the exact bench
program (frames=64, chunk=4), so the remote compile cache makes it cheap
after any bench run.

Run on a live TPU attach:  python scripts/wall_device_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from loam_tpu import LidarParams, odometry_offline
    from loam_tpu.io import render_trajectory
    from loam_tpu.profiling import device_time, force

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    F = int(os.environ.get("PROBE_FRAMES", "64"))
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    # canary
    a = jnp.ones((1024, 1024), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    force(f(a))
    t0 = time.perf_counter()
    out = None
    for _ in range(3):
        out = f(a)
    force(out)
    print(f"canary_ms: {(time.perf_counter() - t0) / 3 * 1000:.2f}",
          flush=True)

    def run(x):
        traj, details = odometry_offline(
            x, lidar, chunk_pairs=4, motion_init=True
        )
        return traj

    force(run(scans))  # compile + warm
    force(run(scans + jnp.float32(1e-6)))  # throwaway timed-arm warmup

    # wall per scan at varying enqueued reps, one barrier at the end
    walls = {}
    for R in (1, 2, 3, 6, 12):
        best = None
        for trial in range(3):
            t0 = time.perf_counter()
            out = None
            for i in range(R):
                out = run(scans + jnp.float32(1e-6) * (trial * 100 + i + 1))
            force(out)
            dt = (time.perf_counter() - t0) / (R * F) * 1000
            best = dt if best is None else min(best, dt)
        walls[R] = best
        print(f"reps={R:2d}: wall {best:.3f} ms/scan", flush=True)

    # device-only (in-program rep folding, RTT-subtracted)
    dev = device_time(run, scans, n_inner=4, reps=2) / F * 1000
    print(f"device_time: {dev:.3f} ms/scan", flush=True)

    # linear fit wall(R) = dev + fixed/(R*F) + per_rep/F
    Rs = np.array(sorted(walls))
    y = np.array([walls[int(r)] for r in Rs])  # ms/scan
    A = np.stack([1.0 / (Rs * F), np.ones_like(Rs, float) / F], axis=1)
    coef, *_ = np.linalg.lstsq(A, y - dev, rcond=None)
    fixed_ms, per_rep_ms = coef
    print(f"attribution: device {dev:.3f} ms/scan; fixed "
          f"{fixed_ms:.1f} ms/measurement; per-rep {per_rep_ms:.1f} ms/rep "
          f"(F={F})")
    print(f"wall/device ratio at reps=3: {walls[3] / dev:.3f}")


if __name__ == "__main__":
    main()
