"""Minimized standalone repro of the TPU-runtime vmap miscompile.

Round-4 hardware finding (docs/PERFORMANCE.md "bit-faithfulness findings";
scripts/extract_oracle_check.py is the full classifier): on this image's
TPU runtime, `jax.vmap` of loam-tpu's XLA-fallback extraction stages
produces garbage picks at Ouster-64 batch scale while the identical
computation under `lax.map`, on CPU, or single-frame is exact.

This script reproduces the failure WITHOUT loam-tpu: it distills the
fallback pipeline's shape — a batched multi-key `lax.sort` along the last
axis of a (L, S, m) view followed by a take-along-axis gather of the
sorted positions — vmapped over a frame axis, and compares against the
NumPy result. Run it on a future runtime to decide whether the library
fence (`loam_tpu/features/extract.py::extract_features_batch`) can be
retired:

    python scripts/vmap_miscompile_repro.py          # current backend
    JAX_PLATFORMS=cpu python scripts/vmap_miscompile_repro.py   # control

Exit code 0 = runtime is clean (fence removable after re-running the full
classifier); 1 = miscompile still present.

If this distilled form passes but the classifier still fails, the bug
needs more of the real pipeline to trigger — fall back to
`scripts/extract_oracle_check.py` (loam-tpu required) as the repro to
report, which pins the failure against the pure-NumPy f64 oracle.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

F, L, S, M = 8, 64, 6, 176  # frames, lines, sectors, points/sector (padded)


def pick(scan_flat):
    """Distilled fallback extraction: per-(line,sector) stable sort by a
    computed key, gather point ids in sorted order, then a windowed scan
    over the sorted tail — the op mix of sector_sort="xla" +
    feature_assemble="gather" + greedy_nms="xla"."""
    v = scan_flat.reshape(L, S, M)
    key = jnp.abs(v - jnp.roll(v, 1, axis=-1)) + 1e-3 * jnp.roll(v, 2, -1)
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (L, S, M))
    skey, spos = lax.sort((key, pos), dimension=-1, num_keys=1, is_stable=True)
    # gather values at sorted positions (the "assemble" gather)
    picked = jnp.take_along_axis(v, spos.astype(jnp.int32), axis=-1)
    # windowed suppression scan over the sorted order (the "NMS" scan)
    def step(carry, x):
        kv, pv = x
        keep = (kv > carry) & (pv % 3 != 0)
        return jnp.where(keep, kv, carry), keep
    _, keeps = lax.scan(step, jnp.zeros((L, S)), (skey.transpose(2, 0, 1),
                                                  spos.transpose(2, 0, 1)))
    return picked, spos, keeps.transpose(1, 2, 0)


def distilled() -> int:
    """Level 1: standalone op-mix distillation (no loam-tpu). As of round 5
    this does NOT trigger the bug — kept as the tracking probe for whether
    a pure-XLA repro ever becomes possible."""
    rng = np.random.default_rng(0)
    scans = rng.standard_normal((F, L * S * M)).astype(np.float32)
    js = jnp.asarray(scans)

    ref = [jax.tree.map(np.asarray, jax.jit(pick)(js[f])) for f in range(F)]
    vm = jax.tree.map(np.asarray, jax.jit(jax.vmap(pick))(js))
    mp = jax.tree.map(np.asarray, jax.jit(lambda x: lax.map(pick, x))(js))

    bad = 0
    for name, got in (("vmap", vm), ("lax.map", mp)):
        mism = sum(
            int(not all(np.array_equal(g[f], r) for g, r in zip(got, ref[f])))
            for f in range(F)
        )
        print(f"level1 {name:8s}: {mism}/{F} frames mismatch single-frame")
        bad += mism if name == "vmap" else 0
        if name == "lax.map" and mism:
            print("  (lax.map also wrong: different/larger bug than round 4's)")
            bad += mism
    return bad


def real_pipeline() -> int:
    """Level 2: the smallest known-failing REAL configuration (loam-tpu
    required): vmapped extract_features with the XLA-fallback stages at
    Ouster-64 scale, compared against the identical computation under
    lax.map. lax.map is pinned oracle-exact separately
    (scripts/extract_oracle_check.py), so vmap != lax.map convicts vmap.
    Reproduces on this image's TPU runtime as of 2026-08-20:
    frame 0 -> 2497 edges under vmap vs 426 under lax.map."""
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.profiling import force

    lidar = LidarParams(64, 1024, 0.5, 120.0)
    scans, _ = render_trajectory(
        lidar, 8, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    js = jnp.asarray(scans)
    pp = FeatureExtractionParams(
        sector_sort="xla", feature_assemble="gather", greedy_nms="xla"
    )
    fn = lambda x: extract_features(x, lidar, pp)
    vm = jax.jit(lambda x: jax.vmap(fn)(x))(js)
    force(vm)
    mp = jax.jit(lambda x: lax.map(fn, x))(js)
    force(mp)
    bad = 0
    for f in range(js.shape[0]):
        ev = sorted(
            np.asarray(vm.edge_indices[f])[np.asarray(vm.edge_mask[f])]
            .tolist()
        )
        em = sorted(
            np.asarray(mp.edge_indices[f])[np.asarray(mp.edge_mask[f])]
            .tolist()
        )
        if ev != em:
            print(f"level2 frame {f}: vmap {len(ev)} edges vs "
                  f"lax.map {len(em)} — MISCOMPILE REPRODUCED")
            bad += 1
    if not bad:
        print("level2: vmap == lax.map on all frames (runtime clean)")
    return bad


def main():
    bad = distilled()
    try:
        bad += real_pipeline()
    except ImportError:
        print("level2 skipped: loam_tpu not importable")
    print("backend:", jax.devices()[0].platform)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
