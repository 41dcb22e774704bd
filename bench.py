"""Headline benchmark: end-to-end scan-to-scan odometry throughput, one chip.

Workload matches the reference's published numbers (``README.md:31``,
BASELINE.md): Ouster-64 geometry — 64 x 1024 = 65,536-point scans — full
pipeline (feature extraction + ICF registration per consecutive pair).
Reference baseline: ~16.5 ms/scan end-to-end single CPU core => ~60.6
scans/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs:
  LOAM_BENCH_FRAMES   (default 64)  frames per timed batch
  LOAM_BENCH_REPS     (default 8)   timed repetitions. Round-5 probe
                      (scripts/wall_device_probe.py): the wall-vs-device
                      gap is a FIXED ~59 ms per measurement (final-barrier
                      round trip + pipeline fill) with ~zero per-rep cost
                      (host dispatch fully overlaps device compute), so
                      more enqueued reps amortize it: reps=3 ran at 1.20x
                      device_time, reps=8 at ~1.08x. Sustained-throughput
                      semantics are unchanged (true barrier at the end).
  LOAM_BENCH_CHUNK    (default 4)   registration pairs per lockstep chunk
  LOAM_BENCH_BACKEND  (default "bruteforce") neighbor search backend
  LOAM_BENCH_DEADLINE (default 480) wall-clock budget in seconds; the JSON
                      line is GUARANTEED to print before this elapses

Guaranteed emission (round-4): round 3's official bench run timed out on a
slow chip session and left the round with no perf record (BENCH_r03.json:
rc 124, parsed null). Now a watchdog thread force-emits the best partial
measurement (stamped ``"config"``) and exits 0 if the main path — e.g. a
hung remote compile — is still running at LOAM_BENCH_DEADLINE; the main
path additionally downgrades to the cheapest honest config (6 frames,
1 rep) if warmup hasn't finished by half-deadline. A fixed canary kernel
is timed at start and reported as ``"canary_ms"`` so session health is
visible in every artifact.

The pair axis is processed in ``lax.map`` chunks (``chunk_pairs``), so the
compiled program size is constant in the frame count — large frame batches
amortize the ~30 ms remote-dispatch latency without tripping the remote
compile helper the way fully-unrolled >=14-frame programs did. On failure the
bench halves the frame count and retries.
"""

import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.perf_counter()

# Shared progress record: the watchdog emits from this if the main thread is
# stuck (remote compile hangs can't be interrupted from Python).
_STATE = {
    "mode": "scan_to_scan",
    "value": None,       # best honest throughput measured so far (scans/s)
    "stage": "init",     # init -> canary -> warmup -> gated -> timed -> done
    "config": "",        # human-readable stamp of the config that produced it
    "canary_ms": None,
    "emitted": False,
    "lock": threading.Lock(),
}


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _deadline() -> float:
    return float(os.environ.get("LOAM_BENCH_DEADLINE", "480"))


def _record(value, config: str, stage: str = "timed"):
    with _STATE["lock"]:
        _STATE["value"] = value
        _STATE["config"] = config
        _STATE["stage"] = stage


def _emit(value, config: str):
    """Print THE json line exactly once (main thread or watchdog)."""
    with _STATE["lock"]:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
    baseline = 1000.0 / 16.5  # reference: 3.5 ms extract + 13 ms register
    metric = {
        "scan_to_map": "e2e_scan_to_map_throughput",
        "batched_pairs": "batched_pair_registration_throughput",
        "dataset": "file_fed_odometry_throughput",
    }.get(_STATE["mode"], "e2e_odometry_throughput")
    out = {
        "metric": metric,
        "value": round(float(value), 2),
        "unit": "scans/s/chip (64x1024 Ouster-64 scans)",
        "vs_baseline": round(float(value) / baseline, 2),
        "config": config,
    }
    if _STATE["canary_ms"] is not None:
        out["canary_ms"] = round(_STATE["canary_ms"], 2)
    print(json.dumps(out), flush=True)


def _watchdog():
    """Force-emit and exit if the main path blows the deadline."""
    deadline = _deadline()
    while True:
        time.sleep(1.0)
        with _STATE["lock"]:
            if _STATE["emitted"]:
                return
        if _elapsed() >= deadline - 5.0:
            with _STATE["lock"]:  # value+config must come from one _record
                v = _STATE["value"]
                stage = _STATE["stage"]
                cfg = _STATE["config"]
            if v is not None:
                _emit(v, cfg + f"; watchdog@{stage}")
            else:
                # No measurement completed: value 0 is the honest statement
                # that this session produced none, but the artifact parses.
                _emit(0.0, f"watchdog: no measurement (stuck at {stage})")
            sys.stdout.flush()
            os._exit(0)


def _run_canary() -> float:
    """Fixed session-health kernel: a 1024x1024x1024 f32 matmul, timed with
    a true barrier after 3 enqueued reps. ~0.9 ms on a healthy v5e; a slow
    chip session / tunnel shows up here, making throughput numbers from
    different sessions comparable (docs/PERFORMANCE.md variance protocol)."""
    import jax
    import jax.numpy as jnp

    from loam_tpu.profiling import force

    a = jnp.ones((1024, 1024), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    force(f(a))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(3):
        out = f(a)
    force(out)
    return (time.perf_counter() - t0) / 3 * 1000.0


def _feat_params(safe: bool):
    from loam_tpu.params import FeatureExtractionParams

    precise = os.environ.get("LOAM_BENCH_PRECISE", "1") != "0"
    if safe:
        # conservative pre-kernel extraction paths, in case any Pallas
        # kernel fails on this device/runtime
        return FeatureExtractionParams(
            precise_selection=precise,
            sector_sort="xla",
            feature_assemble="gather",
            greedy_nms="xla",
        )
    return FeatureExtractionParams(precise_selection=precise)


def _reg_params(safe: bool, base=None):
    import dataclasses

    from loam_tpu.params import RegistrationParams

    base = base if base is not None else RegistrationParams()
    return dataclasses.replace(base, lm_impl="xla") if safe else base


def _check_accuracy(traj, poses, frames):
    """Benchmark numbers only count if the trajectory is RIGHT.

    Round-2 lesson: a TPU-runtime miscompile of the vmapped extraction
    produced garbage features that still yielded finite (wrong) poses — and
    faster-looking benchmarks. Gate every timed configuration on ATE against
    the renderer's ground truth, not just isfinite."""
    import jax.numpy as jnp
    import numpy as np

    from loam_tpu.evaluation import ate_rmse

    assert bool(jnp.isfinite(traj.translation).all()), "non-finite trajectory"
    gt = np.stack([t for (_, t) in poses])
    est = np.asarray(traj.translation)
    ate = ate_rmse(est, gt, align=False)
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=-1)))
    limit = max(0.05 * path, 0.05)
    assert ate < limit, (
        f"trajectory ATE {ate:.3f} m exceeds {limit:.3f} m "
        f"({frames} frames, {path:.2f} m path) — wrong results, not a benchmark"
    )


def _apply_safe_mode():
    """Retire the env-switched kernels too (map insert) — they read env at
    trace time, so clear jit caches to force the safe retrace. The
    long-proven kNN kernel stays on.

    LOAM_EXTRACT_BATCH=map: the safe-mode XLA fallback stages (gather
    assemble, XLA greedy-NMS scan) MISCOMPILE under vmap on the current
    TPU runtime (round-4 finding, scripts/extract_oracle_check.py);
    lax.map batching keeps them oracle-exact."""
    import jax

    os.environ["LOAM_MAP_INSERT"] = "scatter"
    os.environ["LOAM_EXTRACT_BATCH"] = "map"
    jax.clear_caches()


def _force(tree):
    """TRUE completion barrier (device->host read of one element per leaf).

    ``jax.block_until_ready`` is unreliable on the remote-attached (axon)
    backend — it can return in ~0.3 ms for a ~200 ms execution, which made
    earlier bench numbers (BENCH_r02: 548 scans/s) measure partly enqueue
    rate. Every timed loop here enqueues its reps then crosses this barrier
    once; see loam_tpu/profiling.py::force."""
    from loam_tpu.profiling import force

    force(tree)


def _timed(run, frames: int, reps: int, config: str = "") -> float:
    """Sustained scans/s: enqueue ``reps`` runs (device executions
    serialize), one true barrier at the end. The single final ~28 ms
    dispatch/transfer round trip is included — honest for a remote chip,
    negligible at reps>=3.

    A single-rep measurement runs first and is recorded as a partial result
    so the watchdog always has an honest number once warmup succeeded."""
    t0 = time.perf_counter()
    _force(run())
    quick = frames / (time.perf_counter() - t0)
    if reps <= 1:
        # reps=1 is the intended final config here, not a watchdog partial
        _record(quick, config)
        return quick
    _record(quick, config + "; reps=1 (partial)")
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run()
    _force(out)
    val = frames * reps / (time.perf_counter() - t0)
    _record(val, config)
    return val


def _timed_median(run, frames: int, reps: int, config: str = "") -> float:
    """Median of up to 3 _timed samples in THIS session (VERDICT r4 item 8:
    one timed sample per round made cross-round trends noise-dominated).
    All samples land in the config stamp next to the session canary; later
    samples are skipped if the deadline approaches. The median is what's
    reported."""
    vals = []
    for s in range(3):
        if s > 0 and _elapsed() > _deadline() * 0.7:
            break
        vals.append(_timed(run, frames, reps, config))
    # lower median: with an even sample count (deadline truncation) report
    # the smaller middle value, never an optimistic best-of-2
    med = float(sorted(vals)[(len(vals) - 1) // 2])
    _record(
        med, config + "; samples=" + ",".join(f"{v:.1f}" for v in vals)
    )
    return med


def _run_bench(
    frames: int, reps: int, backend: str, chunk: int, motion_init: bool,
    safe: bool = False,
) -> float:
    import jax
    import jax.numpy as jnp

    from loam_tpu import LidarParams, odometry_offline
    from loam_tpu.params import RegistrationParams
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    feat_params = _feat_params(safe)
    reg_params = _reg_params(safe, RegistrationParams(search_backend=backend))

    scans, poses = render_trajectory(
        lidar,
        frames,
        step=np.array([0.08, 0.02, 0.0]),
        yaw_rate=0.01,
        noise=0.005,
        seed=0,
        dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    def run():
        traj, details = odometry_offline(
            scans, lidar, feat_params, reg_params, chunk_pairs=chunk,
            motion_init=motion_init,
        )
        return traj

    cfg = f"frames={frames} reps={reps} chunk={chunk} safe={safe}"
    _STATE["stage"] = "warmup: " + cfg
    traj = run()  # compile + warmup
    _force(traj)
    _STATE["stage"] = "gated: " + cfg
    _check_accuracy(traj, poses, frames)

    return _timed_median(run, frames, reps, cfg)


def _run_bench_batched_pairs(frames: int, reps: int, safe: bool = False) -> float:
    """Batched multi-pair registration (BASELINE config 4): all frames
    extracted in one vmapped call, pairs registered in lockstep chunks of 8
    with constant-velocity chaining between chunks (the same prior the
    sequential driver uses — measured on correct features, every
    identity-init pair needs exactly 2 ICF iterations and every prior-init
    pair needs ~1, with NO spread, so there is no lockstep tail to compact;
    the chunked-lockstep form is the efficient shape of this config)."""
    import jax
    import jax.numpy as jnp

    from loam_tpu import LidarParams, odometry_offline
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    scans, poses = render_trajectory(
        lidar, frames, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    feat_params = _feat_params(safe)
    reg_params = _reg_params(safe)

    def run():
        traj, details = odometry_offline(
            scans, lidar, feat_params, reg_params, chunk_pairs=8,
            motion_init=True,
        )
        return traj

    cfg = f"batched_pairs frames={frames} reps={reps} safe={safe}"
    _STATE["stage"] = "warmup: " + cfg
    traj = run()
    _force(traj)
    _STATE["stage"] = "gated: " + cfg
    _check_accuracy(traj, poses, frames)
    return _timed_median(run, frames, reps, cfg)


def _run_bench_scan_to_map(frames: int, reps: int, safe: bool = False) -> float:
    """Scan-to-map throughput: sequential mapping loop, one dispatch per
    trajectory (``scan_to_map_offline``), default map capacities
    (1<<15 edge / 1<<17 planar slots), hardware-default search backend."""
    import jax
    import jax.numpy as jnp

    from loam_tpu import LidarParams, scan_to_map_offline
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    scans, poses = render_trajectory(
        lidar,
        frames,
        step=np.array([0.08, 0.02, 0.0]),
        yaw_rate=0.01,
        noise=0.005,
        seed=0,
        dtype=np.float32,
    )
    scans = jnp.asarray(scans)

    def run():
        from loam_tpu.odometry.scan_to_map import default_map_reg_params

        state, traj, details = scan_to_map_offline(
            scans, lidar, feat_params=_feat_params(safe),
            reg_params=_reg_params(safe, default_map_reg_params()),
        )
        return traj

    cfg = f"scan_to_map frames={frames} reps={reps} safe={safe}"
    _STATE["stage"] = "warmup: " + cfg
    traj = run()
    _force(traj)
    _STATE["stage"] = "gated: " + cfg
    _check_accuracy(traj, poses, frames)
    return _timed_median(run, frames, reps, cfg)


def _run_bench_dataset(frames: int, reps: int, safe: bool = False) -> float:
    """File-fed odometry (the reference's usage model, README.md:44-60):
    KITTI .bin files -> odometry, timed INCLUDING the IO.
    ``LOAM_BENCH_DATASET`` points at a directory of .bin/.pcd files;
    without it a synthetic trajectory is written once to a temp dir
    (ground truth then gates accuracy too).

    Round-5 rewrite (VERDICT r4 item 1): round 4 ran load-ALL / upload-ALL
    / compute — serialized, and upload-bound at 0.8x baseline on the
    tunnel-attached chip (~16-37 MB/s host->device for 50 MB of raw f32
    xyz). Now ``odometry_streaming`` pipelines the three stages: native
    prefetch loader threads read+project+PACK scans (4-byte/point wire
    codec, io/packed.py, quantization below sensor noise), chunks upload
    via async ``device_put`` and register in lockstep while the next chunk
    is still being read. Knobs: LOAM_BENCH_STREAM_CHUNK (frames/chunk,
    default 16), LOAM_BENCH_PACKED=0 to ship raw f32."""
    import glob
    import tempfile

    from loam_tpu import LidarParams, odometry_streaming
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    root = os.environ.get("LOAM_BENCH_DATASET")
    poses = None
    if root:
        paths = sorted(
            glob.glob(os.path.join(root, "*.bin"))
            + glob.glob(os.path.join(root, "*.pcd"))
        )[:frames]
        frames = len(paths)
        assert frames >= 2, f"no scans under {root}"
    else:
        tmp = os.path.join(tempfile.gettempdir(), f"loam_bench_ds_{frames}")
        os.makedirs(tmp, exist_ok=True)
        paths = [os.path.join(tmp, f"{i:06d}.bin") for i in range(frames)]
        scans, poses = render_trajectory(
            lidar, frames, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
            noise=0.005, seed=0, dtype=np.float32,
        )
        if not all(os.path.exists(p) for p in paths):
            for p, scan in zip(paths, scans):
                pts = scan.reshape(-1, 3).astype(np.float32)
                rec = np.concatenate(
                    [pts, np.zeros((len(pts), 1), np.float32)], axis=1
                )
                rec.tofile(p)

    feat_params = _feat_params(safe)
    reg_params = _reg_params(safe)
    chunk = int(os.environ.get("LOAM_BENCH_STREAM_CHUNK", "16"))
    packed = os.environ.get("LOAM_BENCH_PACKED", "1") != "0"
    # real datasets may need a different vertical FOV than the synthetic
    # default (e.g. KITTI HDL-64 ~ -0.42..0.05); wrong FOV = wrong geometry
    elev_lo = float(os.environ.get("LOAM_BENCH_ELEV_LO", "-0.30"))
    elev_hi = float(os.environ.get("LOAM_BENCH_ELEV_HI", "0.25"))

    def run():
        traj, details = odometry_streaming(
            paths, lidar, feat_params, reg_params, chunk_frames=chunk,
            packed=packed, elev_lo=elev_lo, elev_hi=elev_hi,
        )
        return traj

    # Transfer canary: the dataset mode is wire-bound, and tunnel TRANSFER
    # throughput swings ~4x between minutes even when the COMPUTE canary is
    # steady (round-5 pack_delta_ab finding: arms 60-220 scans/s at canary
    # 9.6 ms). Stamp an upload-bandwidth sample so artifacts are comparable.
    import jax as _jax

    _probe = np.random.default_rng(0).integers(
        0, 255, size=(4 << 20,), dtype=np.uint8
    )
    _t0 = time.perf_counter()
    _force(_jax.device_put(_probe))
    wire_mbs = 4.0 / (time.perf_counter() - _t0)
    cfg = (f"dataset frames={frames} reps={reps} chunk={chunk} "
           f"packed={packed} safe={safe} wire_mbs={wire_mbs:.0f}")
    _STATE["stage"] = "warmup: " + cfg
    traj = run()
    _force(traj)
    _STATE["stage"] = "gated: " + cfg
    if poses is not None:
        _check_accuracy(traj, poses, frames)
    return _timed_median(run, frames, reps, cfg)


def main():
    mode = os.environ.get("LOAM_BENCH_MODE", "scan_to_scan")
    _STATE["mode"] = mode
    frames = int(os.environ.get("LOAM_BENCH_FRAMES", "64"))
    reps = int(os.environ.get("LOAM_BENCH_REPS", "8"))
    # chunk=4: measured optimum on v5e with correct features (r3 sweep:
    # 1 -> 330, 4 -> 347, 8 -> 330, 16 -> 307 scans/s) — with ~1 ICF
    # iteration per prior-initialized pair, lockstep has no tail and the
    # batched glue amortizes the per-iteration op overhead
    chunk = int(os.environ.get("LOAM_BENCH_CHUNK", "4"))
    backend = os.environ.get("LOAM_BENCH_BACKEND", "bruteforce")
    motion_init = os.environ.get("LOAM_BENCH_MOTION_INIT", "1") != "0"

    threading.Thread(target=_watchdog, daemon=True).start()

    _STATE["stage"] = "canary"
    try:
        _STATE["canary_ms"] = _run_canary()
    except Exception as e:
        print(f"# canary failed: {type(e).__name__}: {e}", file=sys.stderr)

    scans_per_sec = None
    safe = os.environ.get("LOAM_BENCH_SAFE", "0") == "1"
    if safe:
        _apply_safe_mode()
    while True:
        # Half-deadline downgrade: if earlier attempts (or a glacial canary/
        # compile that DID eventually return) ate half the budget with no
        # measurement banked, drop to the cheapest honest config so at least
        # one real number lands before the watchdog fires.
        if _STATE["value"] is None and _elapsed() > _deadline() / 2 and (
            frames > 6 or reps > 1
        ):
            frames, reps = min(frames, 6), 1
            print(f"# half-deadline reached with no measurement; "
                  f"downgrading to frames={frames} reps={reps}",
                  file=sys.stderr)
        try:
            if mode == "scan_to_map":
                scans_per_sec = _run_bench_scan_to_map(frames, reps, safe)
            elif mode == "batched_pairs":
                scans_per_sec = _run_bench_batched_pairs(frames, reps, safe)
            elif mode == "dataset":
                scans_per_sec = _run_bench_dataset(frames, reps, safe)
            else:
                scans_per_sec = _run_bench(
                    frames, reps, backend, chunk, motion_init, safe
                )
            break
        except Exception as e:  # transient remote-compile/device aborts
            if not safe:
                # first rung: retire every new Pallas kernel in case the
                # failure is a deterministic kernel-compile error
                safe = True
                _apply_safe_mode()
                print(f"# bench failed ({type(e).__name__}); retrying with "
                      f"safe params", file=sys.stderr)
                continue
            if frames <= 6:
                raise
            frames = max(6, frames // 2)
            print(f"# bench failed ({type(e).__name__}); retrying at "
                  f"{frames} frames", file=sys.stderr)

    _emit(scans_per_sec, _STATE["config"] or
          f"frames={frames} reps={reps} safe={safe}")


if __name__ == "__main__":
    main()
