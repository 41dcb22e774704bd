"""Pallas feature-assemble kernel vs the XLA gather — exact equality."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from loam_tpu.ops.assemble_pallas import select_points


def _rand_case(rng, L, P, C, dup=False):
    pts = jnp.asarray(rng.standard_normal((L, P, 3)).astype(np.float32))
    picks = rng.integers(-1, P, (L, C)).astype(np.int32)
    if dup:
        picks[:, 1] = picks[:, 0]  # duplicate picks are legal
    return pts, jnp.asarray(picks)


@pytest.mark.parametrize("L,P,C", [(4, 64, 16), (8, 256, 130), (3, 100, 7)])
def test_pallas_matches_gather(L, P, C):
    rng = np.random.default_rng(0)
    pts, picks = _rand_case(rng, L, P, C, dup=True)
    want = select_points(pts, picks, impl="gather")
    got = select_points(pts, picks, impl="pallas")  # interpret on CPU
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_negative_picks_zero():
    pts = jnp.ones((2, 16, 3), jnp.float32)
    picks = jnp.asarray([[-1, 0], [5, -1]], jnp.int32)
    out = select_points(pts, picks, impl="gather")
    np.testing.assert_array_equal(
        np.asarray(out),
        np.asarray([[[0, 0, 0], [1, 1, 1]], [[1, 1, 1], [0, 0, 0]]], np.float32),
    )


def test_extraction_assemble_impl_equality():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams
    from loam_tpu.io import render_scan

    lidar = LidarParams(8, 256, 0.5, 80.0)
    scan = jnp.asarray(render_scan(lidar, noise=0.01, seed=3, dtype=np.float32))
    base = FeatureExtractionParams()
    a = extract_features(
        scan, lidar, dataclasses.replace(base, feature_assemble="gather")
    )
    b = extract_features(
        scan, lidar, dataclasses.replace(base, feature_assemble="pallas")
    )
    for name in (
        "edge_points", "edge_mask", "edge_indices",
        "planar_points", "planar_mask", "planar_indices",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name
        )
