"""In-process A/B of the extraction kernels (sector sort + assemble).

Compares, back-to-back in ONE process (session throughput varies ~15%):
  1. batched extraction alone, 4 combos of
     sector_sort in {xla, bitonic} x feature_assemble in {gather, pallas};
  2. end-to-end scan-to-scan odometry with the old (xla+gather) vs new
     (bitonic+pallas) extraction.

Correctness: every combo's FeatureSet is asserted identical to the
xla+gather baseline before timing (they are exact-equality paths).

Run: python scripts/extract_ab.py
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
    fn(0)  # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        fn(i + 1)
    dt = time.perf_counter() - t0
    print(f"{name:55s} {scans_per_rep*reps/dt:8.1f} scans/s"
          f"   ({dt/reps*1e3/scans_per_rep:6.3f} ms/scan)", flush=True)


def main():
    from loam_tpu import LidarParams, extract_features, odometry_offline
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_trajectory

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    F = 32
    scans, _ = render_trajectory(
        lidar, F, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    print("devices:", jax.devices(), flush=True)

    base = FeatureExtractionParams(
        sector_sort="xla", feature_assemble="gather", greedy_nms="xla"
    )
    combos = [
        ("baseline (xla sort, gather, xla nms)", base),
        ("+bitonic sort", dataclasses.replace(base, sector_sort="bitonic")),
        ("+pallas assemble", dataclasses.replace(base, feature_assemble="pallas")),
        ("+pallas nms", dataclasses.replace(base, greedy_nms="pallas")),
        ("all kernels", dataclasses.replace(
            base, sector_sort="bitonic", feature_assemble="pallas",
            greedy_nms="pallas")),
    ]

    extract_jits = {
        name: jax.jit(lambda s, pp=p: jax.vmap(
            lambda x: extract_features(x, lidar, pp))(s))
        for name, p in combos
    }

    # Correctness first — against the f64 NumPy ORACLE, not a peer combo:
    # round 4 found the vmapped XLA fallback stages miscompile on this
    # runtime (scripts/extract_oracle_check.py), so equality-to-baseline
    # would silently bless two identically-wrong arms. Combos that fail the
    # oracle are excluded from timing (their numbers would be meaningless).
    from loam_tpu.oracle import oracle

    scans_np = np.asarray(scans)
    osets = []
    for f in range(F):
        e, pl_ = oracle.extract_features(
            scans_np[f].astype(np.float64), lidar, FeatureExtractionParams()
        )
        osets.append((sorted(e), sorted(pl_)))
    good = []
    for name, p in combos:
        fs = extract_jits[name](scans)
        ei = np.asarray(fs.edge_indices)
        em = np.asarray(fs.edge_mask)
        pi = np.asarray(fs.planar_indices)
        pm = np.asarray(fs.planar_mask)
        ok = all(
            sorted(ei[f][em[f]].tolist()) == osets[f][0]
            and sorted(pi[f][pm[f]].tolist()) == osets[f][1]
            for f in range(F)
        )
        print(f"{name}: {'oracle-exact' if ok else 'WRONG (vmapped) - skipping timings'}",
              flush=True)
        if ok:
            good.append((name, p))
    combos = good

    for name, _p in combos:
        fn = extract_jits[name]
        timed(
            f"extract batched [{name}]",
            lambda i, fn=fn: float(jnp.sum(fn(scans + jnp.float32(1e-6) * i).planar_points)),
            F,
        )

    F2 = 64
    scans2, _ = render_trajectory(
        lidar, F2, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans2 = jnp.asarray(scans2)

    for name, p in [combos[0], combos[-1]]:
        def run(i, p=p):
            traj, det = odometry_offline(
                scans2 + jnp.float32(1e-6) * i, lidar, feat_params=p,
                motion_init=True,
            )
            return float(jnp.sum(traj.translation))
        timed(f"odometry_offline e2e [{name}]", run, F2)


if __name__ == "__main__":
    main()
