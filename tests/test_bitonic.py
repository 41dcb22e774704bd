"""Bitonic sort vs stable ``lax.sort`` — exact equality.

The network is unstable, so every case includes a unique tie-break key
(slot index) as the last key, matching how the extraction driver uses it;
with a total order the two must agree bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from loam_tpu.ops.bitonic import bitonic_network, bitonic_sort


def _stable_ref(arrays, num_keys):
    return lax.sort(tuple(arrays), dimension=0, num_keys=num_keys, is_stable=True)


@pytest.mark.parametrize("n,b", [(8, 4), (37, 5), (179, 384), (256, 128)])
def test_matches_stable_sort_with_index_tiebreak(n, b):
    rng = np.random.default_rng(0)
    # coarse quantization -> plenty of key ties, resolved by the index key
    keys = jnp.asarray(rng.integers(0, 7, (n, b)).astype(np.float32))
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, b))
    payload = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

    got = bitonic_sort((keys, idx, payload), num_keys=2)
    want = _stable_ref((keys, idx, payload), num_keys=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_two_float_keys_lexicographic():
    rng = np.random.default_rng(1)
    n, b = 64, 32
    hi = jnp.asarray(rng.integers(0, 4, (n, b)).astype(np.float32))
    lo = jnp.asarray(rng.integers(0, 4, (n, b)).astype(np.float32))
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, b))
    got = bitonic_sort((hi, lo, idx), num_keys=3, impl="xla")
    want = _stable_ref((hi, lo, idx), num_keys=3)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_inf_padding_rows_stay_at_end_without_tiebreak():
    # fully-duplicate +inf padding rows sort after real rows even though
    # they tie with each other (equal elements are never swapped)
    n, b = 48, 8
    rng = np.random.default_rng(2)
    keys = rng.standard_normal((n, b)).astype(np.float32)
    keys[30:] = np.inf
    pos = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, b))
    pos[30:] = 1023  # identical dummy payload on every pad row
    got_k, got_p = bitonic_sort(
        (jnp.asarray(keys), jnp.asarray(pos)), num_keys=1, impl="xla"
    )
    want_k, want_p = _stable_ref((jnp.asarray(keys), jnp.asarray(pos)), 1)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_internal_padding_to_power_of_two():
    # n=179 exercises the internal pad-to-256 path; result must equal the
    # unpadded stable sort
    rng = np.random.default_rng(3)
    n, b = 179, 12
    keys = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, b))
    got = bitonic_sort((keys, idx), num_keys=2)
    want = _stable_ref((keys, idx), num_keys=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pallas_interpret_matches_xla_path(monkeypatch):
    import loam_tpu.ops.bitonic as bt

    monkeypatch.setattr(bt, "_INTERPRET", True)
    rng = np.random.default_rng(4)
    n, b = 64, 16
    keys = jnp.asarray(rng.integers(0, 9, (n, b)).astype(np.float32))
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, b))
    got = bt.bitonic_sort((keys, idx), num_keys=2, impl="pallas")
    want = _stable_ref((keys, idx), num_keys=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_extraction_bitonic_sector_sort_exact_equality():
    """extract_features output is invariant to the sector_sort impl."""
    import dataclasses

    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_scan

    lidar = LidarParams(8, 256, 0.5, 80.0)
    scan = jnp.asarray(render_scan(lidar, noise=0.01, seed=11, dtype=np.float32))
    for precise in (True, False):
        base = FeatureExtractionParams(precise_selection=precise)
        a = extract_features(scan, lidar, dataclasses.replace(base, sector_sort="xla"))
        b = extract_features(
            scan, lidar, dataclasses.replace(base, sector_sort="bitonic")
        )
        for name in (
            "edge_points", "edge_mask", "edge_indices",
            "planar_points", "planar_mask", "planar_indices",
        ):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                err_msg=f"{name} precise={precise}",
            )


def test_sort_1d_matches_stable_sort():
    from loam_tpu.ops.bitonic import bitonic_sort_1d

    rng = np.random.default_rng(5)
    for n in (100, 1024, 5000):
        keys = jnp.asarray(rng.integers(0, 50, (n,)).astype(np.int32))
        idx = jnp.arange(n, dtype=jnp.int32)
        pay = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
        got = bitonic_sort_1d((keys, idx, pay), num_keys=2)
        want = lax.sort((keys, idx, pay), dimension=0, num_keys=2, is_stable=True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_1d_float_keys_with_inf():
    from loam_tpu.ops.bitonic import bitonic_sort_1d

    rng = np.random.default_rng(6)
    n = 3000
    keys = rng.standard_normal(n).astype(np.float32)
    keys[::7] = np.inf  # invalid slots sort last (pads are +inf too)
    idx = np.arange(n, dtype=np.int32)
    got = bitonic_sort_1d((jnp.asarray(keys), jnp.asarray(idx)), num_keys=2)
    want = lax.sort((jnp.asarray(keys), jnp.asarray(idx)), dimension=0,
                    num_keys=2, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))




def test_sector_sort_raw_equality_including_dead_slots():
    """_sector_sort's bitonic path equals lax.sort row-for-row, including
    +inf-keyed (invalid) slots vs internal power-of-two padding."""
    from loam_tpu.features.extract import _sector_sort

    rng = np.random.default_rng(8)
    L, S, m = 4, 3, 46  # pads 46 -> 64 internally
    c = rng.uniform(0, 10, (L, S, m)).astype(np.float32)
    c[:, :, 40:] = np.inf  # invalid slots carry +inf keys like production
    cl = rng.uniform(-1, 1, (L, S, m)).astype(np.float32)
    cl[:, :, 40:] = 0.0
    pos = np.broadcast_to(np.arange(m, dtype=np.int32), (L, S, m)).copy()
    a = _sector_sort(jnp.asarray(c), jnp.asarray(cl), jnp.asarray(pos), "xla")
    b = _sector_sort(jnp.asarray(c), jnp.asarray(cl), jnp.asarray(pos), "bitonic")
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(gb), np.asarray(ga))
