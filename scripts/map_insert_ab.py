"""In-process A/B of voxel_map_insert impls (scatter vs bitonic kernels).

Times standalone inserts at bench map capacities (1<<15 edge / 1<<17
planar), then end-to-end scan-to-map with each impl forced via
LOAM_MAP_INSERT (reading it requires jax.clear_caches() between arms).

Run: python scripts/map_insert_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(name, fn, reps=8):
    fn(0)
    t0 = time.perf_counter()
    for i in range(reps):
        fn(i + 1)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:55s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    from loam_tpu import voxel_map_empty, voxel_map_insert

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for cap, n_new, label in ((1 << 15, 4224, "edge"), (1 << 17, 19584, "planar")):
        # build a realistically full map first
        m0 = voxel_map_empty(cap, 0.4 if label == "planar" else 0.2)
        seed_pts = jnp.asarray(
            rng.uniform(-60, 60, (cap, 3)).astype(np.float32))
        m0, _ = voxel_map_insert(m0, seed_pts, jnp.ones((cap,), bool),
                                 impl="scatter")
        print(f"{label}: capacity {cap}, occupied {int(m0.size)}", flush=True)
        new = jnp.asarray(rng.uniform(-60, 60, (n_new, 3)).astype(np.float32))
        mask = jnp.ones((n_new,), bool)
        center = jnp.zeros((3,), jnp.float32)

        outs = {}
        for impl in ("scatter", "bitonic"):
            def run(i, impl=impl):
                m, d = voxel_map_insert(
                    m0, new + jnp.float32(1e-6) * i, mask, center, 100.0,
                    impl=impl,
                )
                return float(jnp.sum(m.points)) + float(d)
            timed(f"insert {label} cap={cap} [{impl}]", run)
            m, d = voxel_map_insert(m0, new, mask, center, 100.0, impl=impl)
            outs[impl] = (np.asarray(m.points), np.asarray(m.mask), int(d))
        np.testing.assert_array_equal(outs["scatter"][1], outs["bitonic"][1])
        np.testing.assert_array_equal(outs["scatter"][0], outs["bitonic"][0])
        assert outs["scatter"][2] == outs["bitonic"][2]
        print(f"{label}: impls exact-equal", flush=True)

    # end-to-end scan-to-map, insert impl forced via env (trace-time read:
    # clear jit caches between arms)
    from loam_tpu import LidarParams, scan_to_map_offline
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    F = 32
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    for impl in ("scatter", "bitonic"):
        os.environ["LOAM_MAP_INSERT"] = impl
        jax.clear_caches()

        def run(i):
            state, traj, det = scan_to_map_offline(
                scans + jnp.float32(1e-6) * i, lidar
            )
            return float(jnp.sum(traj.translation))

        run(0)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            run(i + 1)
        dt = time.perf_counter() - t0
        print(f"scan_to_map e2e [insert={impl}]    {F*reps/dt:8.1f} scans/s",
              flush=True)
    del os.environ["LOAM_MAP_INSERT"]


if __name__ == "__main__":
    main()
