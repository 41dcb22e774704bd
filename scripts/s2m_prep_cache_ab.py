"""FAIR A/B of the scan-to-map rebuild-on-insert kNN prep cache.

Round-4 ran this A/B confounded: the prep-cache path fed ``custom_knn``
callables that bypassed the registration loop's seed-bound machinery, so
the comparison was (prep savings − seed losses). Round 5 threads the seed
windows + per-iteration visit-gate bounds through ``custom_knn``
(icf.py ``_register_impl`` 3-element contract; scan_to_map.py caches the
windows too), so both arms now run identical kernel gating and the A/B
isolates the prep rebuild alone (VERDICT r4 item 3).

Protocol (docs/PERFORMANCE.md session-health): canary stamp, one throwaway
warmup arm, then INTERLEAVED repeated arms in one process. device_time
can't wrap the whole offline driver (env toggling changes the traced
program), so the arms are wall-timed with true barriers over identical
dispatch structure — differences are attributable because arms interleave
within one session.

Run on a live TPU attach:  python scripts/s2m_prep_cache_ab.py [FRAMES]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(os.environ.get("AB_REPS", "2"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))

    from loam_tpu import LidarParams, scan_to_map_offline
    from loam_tpu.io import render_trajectory
    from loam_tpu.profiling import force

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    # canary (session health stamp)
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

    def arm(cache_on: bool, i: int) -> float:
        os.environ["LOAM_S2M_PREP_CACHE"] = "1" if cache_on else "0"
        jax.clear_caches()  # env is read at trace time
        def run(j):
            state, traj, details = scan_to_map_offline(
                scans + jnp.float32(1e-6) * j, lidar
            )
            return traj
        for attempt in range(4):  # remote compile aborts are transient
            try:
                force(run(i * 100))  # compile (service caches by fingerprint)
                break
            except Exception as e:
                if attempt == 3:
                    raise
                print(f"  compile retry {attempt + 1}: {type(e).__name__}",
                      flush=True)
                time.sleep(5)
                jax.clear_caches()
        t0 = time.perf_counter()
        last = None
        for j in range(reps):
            last = run(i * 100 + j + 1)
        force(last)
        return F * reps / (time.perf_counter() - t0)

    arm(False, 999)  # throwaway warmup arm (first timed arm is inflated)
    res = {True: [], False: []}
    for r in range(rounds):
        for cache_on in (True, False):
            v = arm(cache_on, r)
            res[cache_on].append(v)
            print(f"round {r} cache={'on ' if cache_on else 'off'}: "
                  f"{v:7.1f} scans/s", flush=True)
    mon = float(np.median(res[True]))
    moff = float(np.median(res[False]))
    print(f"median cache-on  {mon:7.1f} scans/s")
    print(f"median cache-off {moff:7.1f} scans/s")
    print(f"delta {100 * (mon - moff) / moff:+.1f}% "
          f"({'CACHE WINS' if mon > moff * 1.02 else 'CACHE LOSES' if mon < moff * 0.98 else 'NEUTRAL'})")


if __name__ == "__main__":
    main()
