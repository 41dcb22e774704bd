"""Interleaved A/B of the packed wire format's range-delta pass
(LOAM_PACK_DELTA): standalone upload probes said delta moves the same
bytes 2.1x faster through the tunnel's wire compressor, but single-session
bench runs disagreed (266 plain @ canary 9.9 vs 175-190 delta @ 10-10.8).
This settled it the round-4 way: same process, arms interleaved, repeated:
run 1 (canary 9.6): on 220.6/60.7/125.0, off 126.9/77.8/152.8 -> NEUTRAL;
run 2 (canary 11.7): on 112.4/118.9/102.4, off 121.3/96.3/204.0 -> -7.3%.
Arms swing 4x within one process — tunnel throughput variance dominates —
so the delta pass was PRUNED (io/packed.py keeps the note). Rerunning this
script requires re-adding the LOAM_PACK_DELTA knob to the codec (see git
history at the round-5 pruning commit).

Run on a live TPU attach:  python scripts/pack_delta_ab.py [FRAMES]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(os.environ.get("AB_REPS", "8"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    import tempfile
    from loam_tpu import LidarParams, odometry_streaming
    from loam_tpu.io import render_trajectory
    from loam_tpu.profiling import force
    import jax.numpy as jnp

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    tmp = os.path.join(tempfile.gettempdir(), f"loam_bench_ds_{F}")
    paths = [os.path.join(tmp, f"{i:06d}.bin") for i in range(F)]
    if not all(os.path.exists(p) for p in paths):
        os.makedirs(tmp, exist_ok=True)
        scans, _ = render_trajectory(lidar, F, step=np.array([0.08,0.02,0.0]),
                                     yaw_rate=0.01, noise=0.005, seed=0,
                                     dtype=np.float32)
        for p, s in zip(paths, scans):
            pts = s.reshape(-1,3).astype(np.float32)
            np.concatenate([pts, np.zeros((len(pts),1),np.float32)],1).tofile(p)

    a = jnp.ones((1024,1024), jnp.float32); f = jax.jit(lambda x: x@x)
    force(f(a)); t0=time.perf_counter()
    o=None
    for _ in range(3): o=f(a)
    force(o)
    print(f"canary_ms: {(time.perf_counter()-t0)/3*1000:.2f}", flush=True)

    def arm(delta: bool) -> float:
        os.environ["LOAM_PACK_DELTA"] = "1" if delta else "0"
        def run():
            traj, _ = odometry_streaming(paths, lidar, chunk_frames=16,
                                         packed=True)
            return traj
        force(run().translation)  # compile (fingerprint-cached) + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            t = run()
        force(t.translation)
        return F * reps / (time.perf_counter() - t0)

    arm(True)  # throwaway warmup arm
    res = {True: [], False: []}
    for r in range(rounds):
        for delta in (True, False):
            v = arm(delta)
            res[delta].append(v)
            print(f"round {r} delta={'on ' if delta else 'off'}: "
                  f"{v:7.1f} scans/s", flush=True)
    mon, moff = float(np.median(res[True])), float(np.median(res[False]))
    print(f"median delta-on  {mon:7.1f}")
    print(f"median delta-off {moff:7.1f}")
    print(f"delta {'WINS' if mon > moff*1.02 else 'LOSES' if mon < moff*0.98 else 'NEUTRAL'} ({100*(mon-moff)/moff:+.1f}%)")

if __name__ == "__main__":
    main()
