"""Pallas greedy-NMS kernel vs the per-line XLA scan — exact equality.

Interpret mode executes the kernel's fori step loop one op at a time, so
cases stay tiny; the kernel/XLA equality at full Ouster-64 scale is covered
by scripts/extract_ab.py on hardware.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from loam_tpu import LidarParams, extract_features
from loam_tpu.params import FeatureExtractionParams
from loam_tpu.io import render_scan


def _compare(lidar, params, seed):
    scan = jnp.asarray(
        render_scan(lidar, noise=0.02, seed=seed, dtype=np.float32)
    )
    a = extract_features(
        scan, lidar, dataclasses.replace(params, greedy_nms="xla")
    )
    b = extract_features(
        scan, lidar, dataclasses.replace(params, greedy_nms="pallas")
    )
    for name in (
        "edge_points", "edge_mask", "edge_indices",
        "planar_points", "planar_mask", "planar_indices",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


def test_greedy_nms_kernel_exact_equality():
    lidar = LidarParams(4, 64, 0.5, 80.0)
    params = FeatureExtractionParams(
        number_sectors=2,
        max_edge_feats_per_sector=2,
        max_planar_feats_per_sector=5,
        neighbor_points=2,
        # loose thresholds -> long candidate lists, caps + suppression and
        # the cross-sector window all get exercised
        edge_feat_threshold=0.5,
        planar_feat_threshold=5.0,
    )
    _compare(lidar, params, seed=0)


def test_greedy_nms_kernel_batched_lane_folding():
    # vmapped extraction must hit the custom_vmap rule (batch folded into
    # kernel lanes) and still match the per-frame XLA path exactly
    import jax

    lidar = LidarParams(4, 64, 0.5, 80.0)
    params = FeatureExtractionParams(
        number_sectors=2,
        max_edge_feats_per_sector=2,
        max_planar_feats_per_sector=5,
        neighbor_points=2,
        edge_feat_threshold=0.5,
        planar_feat_threshold=5.0,
    )
    scans = jnp.stack([
        jnp.asarray(render_scan(lidar, noise=0.02, seed=s, dtype=np.float32))
        for s in range(3)
    ])
    run = lambda mode: jax.vmap(
        lambda x: extract_features(
            x, lidar, dataclasses.replace(params, greedy_nms=mode)
        )
    )(scans)
    a, b = run("xla"), run("pallas")
    for name in (
        "edge_points", "edge_mask", "edge_indices",
        "planar_points", "planar_mask", "planar_indices",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


def test_greedy_nms_kernel_remainder_sector():
    # points_per_line % sectors != 0: the last sector absorbs the remainder
    lidar = LidarParams(3, 50, 0.5, 80.0)
    params = FeatureExtractionParams(
        number_sectors=3,
        max_edge_feats_per_sector=1,
        max_planar_feats_per_sector=3,
        neighbor_points=1,
        edge_feat_threshold=1.0,
        planar_feat_threshold=2.0,
    )
    _compare(lidar, params, seed=1)


def test_padded_sector_edge_candidates_past_count_bound():
    """Round-4 regression: in PADDED sectors the reversed edge candidate
    lists carry (s_max - size) leading -1 slots, so a count-based serial
    bound cut the final 8-group whenever a padded sector held a multiple-
    of-8-boundary-crossing run (frame-16 bug: weakest edge of 20 lines
    dropped). Hand-built candidates pin the exact condition: 2 leading -1
    slots + 8 real candidates => the count bound (8) covers one group
    (positions 0..7) and silently drops the candidate at position 9."""
    from loam_tpu.ops.nms_pallas import greedy_nms

    L, P, S, s_max = 1, 64, 2, 24
    valid = jnp.ones((L, P), bool)
    cand_e = np.full((L, S, s_max), -1, np.int32)
    # sector 0: padded layout — 2 dead slots, then 8 real candidates
    cand_e[0, 0, 2:10] = np.arange(10, 50, 5, dtype=np.int32)
    cand_p = np.full((L, S, s_max), -1, np.int32)
    ep, pp_ = greedy_nms(
        valid, jnp.asarray(cand_e), jnp.asarray(cand_p),
        max_e=12, max_p=12, n=1, pps=P // S, s_max=s_max,
    )
    got = np.asarray(ep)[0, 0]
    got = sorted(got[got >= 0].tolist())
    # n=1 => zero suppression halfwidth: every candidate must be accepted
    assert got == list(range(10, 50, 5)), got
