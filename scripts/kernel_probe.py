"""One-shot TPU lowering probe for every session-3 Pallas kernel path.

Compiles + runs each kernel knob on the attached backend and asserts exact
output equality against the pre-kernel XLA path. Exits nonzero on the first
divergence or compile failure so it can gate kernel-default changes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.params import LidarParams, FeatureExtractionParams
from loam_tpu.features.extract import extract_features


def make_scan(seed=0, L=64, P=1024):
    rng = np.random.default_rng(seed)
    az = np.linspace(0, 2 * np.pi, P, endpoint=False)
    el = np.linspace(-0.3, 0.3, L)
    r = 10 + rng.normal(0, 0.01, (L, P))
    ce = np.cos(el)[:, None]
    pts = np.stack(
        [r * ce * np.cos(az), r * ce * np.sin(az),
         r * np.sin(el)[:, None] * np.ones_like(az)], -1
    )
    return pts.astype(np.float32)


def main():
    print("devices:", jax.devices())
    pts = jnp.asarray(make_scan())
    lidar = LidarParams(64, 1024, 0.5, 100.0)

    safe = FeatureExtractionParams(
        sector_sort="xla", feature_assemble="gather", greedy_nms="xla"
    )
    ref = jax.block_until_ready(extract_features(pts, lidar, safe))

    combos = {
        "bitonic-sort": dict(sector_sort="bitonic"),
        "pallas-assemble": dict(feature_assemble="pallas"),
        "pallas-nms": dict(greedy_nms="pallas"),
        "all-kernels": dict(
            sector_sort="bitonic", feature_assemble="pallas",
            greedy_nms="pallas",
        ),
    }
    failed = False
    for name, kw in combos.items():
        params = FeatureExtractionParams(
            **{**dict(sector_sort="xla", feature_assemble="gather",
                      greedy_nms="xla"), **kw}
        )
        try:
            out = jax.block_until_ready(
                extract_features(pts, lidar, params)
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COMPILE/RUN FAIL: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            failed = True
            continue
        eq = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(out, ref)
        )
        print(f"{name}: {'OK exact' if eq else 'MISMATCH'}")
        failed |= not eq
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main()
