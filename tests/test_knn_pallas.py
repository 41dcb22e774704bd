"""Pallas kNN kernel tests, run in interpret mode on CPU.

``conftest.py`` sets ``LOAM_PALLAS_INTERPRET=1`` before import, so the
kernel body and all jit-level prep (padding, bbox chunk ranges, dual-class
index remapping) execute as plain XLA here — the same program the TPU runs,
minus Mosaic lowering. Semantics target: exact equality with the XLA
brute-force path (``bruteforce._knn_xla``), which is itself oracle-tested in
``test_neighbors.py`` against the reference's KD-tree semantics
(``/root/reference/loam/src/kdtree.cpp:10-28``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from loam_tpu.neighbors.bruteforce import _knn_xla
from loam_tpu.ops.knn_pallas import knn_pallas, knn_pallas_dual


def _sets(seed, m, q, spread=5.0):
    rng = np.random.default_rng(seed)
    targets = rng.uniform(-spread, spread, size=(m, 3)).astype(np.float32)
    mask = rng.random(m) > 0.15
    queries = rng.uniform(-spread, spread, size=(q, 3)).astype(np.float32)
    return (
        jnp.asarray(queries),
        jnp.asarray(targets),
        jnp.asarray(mask),
    )


def _assert_same(res, ref):
    np.testing.assert_array_equal(np.asarray(res.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(
        np.asarray(res.indices)[m], np.asarray(ref.indices)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(res.distances)[m], np.asarray(ref.distances)[m]
    )


@pytest.mark.parametrize("max_dist", [0.0, 1.5])
@pytest.mark.parametrize("m,q", [(700, 300), (2100, 1100)])
def test_kernel_matches_xla(max_dist, m, q):
    queries, targets, mask = _sets(3, m, q)
    res = knn_pallas(queries, targets, mask, 5, max_dist, tq=256, tt=512)
    ref = _knn_xla(queries, targets, mask, 5, max_dist)
    _assert_same(res, ref)


def test_kernel_k1_and_large_k():
    queries, targets, mask = _sets(4, 900, 200)
    for k in (1, 8):
        res = knn_pallas(queries, targets, mask, k, 2.0, tq=256, tt=512)
        ref = _knn_xla(queries, targets, mask, k, 2.0)
        _assert_same(res, ref)


def test_dual_matches_two_singles():
    """The fused edge+plane search must equal two independent searches —
    the contract the ICF loop relies on (one launch per iteration)."""
    qe, te, me = _sets(5, 1100, 400)
    qp, tp, mp = _sets(6, 2600, 900)
    k_e, k_p, d_e, d_p = 5, 5, 1.0, 2.0
    re_ref = _knn_xla(qe, te, me, k_e, d_e)
    rp_ref = _knn_xla(qp, tp, mp, k_p, d_p)
    re, rp = knn_pallas_dual(
        qe, qp, te, me, tp, mp, k_e, k_p, d_e, d_p, tq=256, tt=512
    )
    _assert_same(re, re_ref)
    _assert_same(rp, rp_ref)


def test_dual_distinct_k():
    """Different per-class k: planar side truncates to its own k exactly."""
    qe, te, me = _sets(7, 600, 150)
    qp, tp, mp = _sets(8, 1500, 500)
    re, rp = knn_pallas_dual(
        qe, qp, te, me, tp, mp, 3, 7, 1.2, 2.2, tq=256, tt=512
    )
    _assert_same(re, _knn_xla(qe, te, me, 3, 1.2))
    _assert_same(rp, _knn_xla(qp, tp, mp, 7, 2.2))


def test_dual_empty_class():
    """An all-invalid edge side must not perturb the planar results."""
    qe, te, _ = _sets(9, 300, 80)
    me = jnp.zeros(te.shape[0], bool)
    qp, tp, mp = _sets(10, 1200, 400)
    re, rp = knn_pallas_dual(
        qe, qp, te, me, tp, mp, 5, 5, 1.0, 2.0, tq=256, tt=512
    )
    assert not bool(re.mask.any())
    _assert_same(rp, _knn_xla(qp, tp, mp, 5, 2.0))


def test_run_with_coords_matches_gather():
    """PackedKnn coordinates must be exact copies of the selected targets
    (the kernel one-hot-reduces them in VMEM), and mask/first_idx must match
    the transposed KnnResult of the plain path."""
    from loam_tpu.ops.knn_pallas import knn_prep, knn_run

    q, t, m = _sets(11, 900, 700)
    k, r = 5, 2.0
    prep = knn_prep(t, m, tt=256)
    ref = knn_run(prep, q, k, r, tq=256)
    packed = knn_run(prep, q, k, r, tq=256, with_coords=True)
    np.testing.assert_array_equal(np.asarray(packed.mask), np.asarray(ref.mask).T)
    np.testing.assert_array_equal(
        np.asarray(packed.first_idx), np.asarray(ref.indices[:, 0])
    )
    tn = np.asarray(t)
    idx = np.asarray(ref.indices)  # (Q, k)
    msk = np.asarray(ref.mask)
    for j in range(k):
        sel = msk[:, j]
        np.testing.assert_array_equal(
            np.asarray(packed.xs)[j][sel], tn[idx[sel, j], 0]
        )
        np.testing.assert_array_equal(
            np.asarray(packed.ys)[j][sel], tn[idx[sel, j], 1]
        )
        np.testing.assert_array_equal(
            np.asarray(packed.zs)[j][sel], tn[idx[sel, j], 2]
        )


def test_packed_association_matches_gathered():
    """associate_* on a PackedKnn must reproduce the gather-based path
    (same valid mask and matches; fits equal to float tolerance — the
    component-packed fit reassociates a few f32 additions)."""
    from loam_tpu.ops.knn_pallas import knn_prep, knn_run
    from loam_tpu.registration.associate import associate_edges, associate_planes
    from loam_tpu.params import RegistrationParams

    q, t, m = _sets(12, 700, 500)
    qmask = jnp.ones(q.shape[0], bool)
    params = RegistrationParams()
    prep = knn_prep(t, m, tt=256)

    res = knn_run(prep, q, params.num_edge_neighbors,
                  params.max_edge_neighbor_dist, tq=256)
    packed = knn_run(prep, q, params.num_edge_neighbors,
                     params.max_edge_neighbor_dist, tq=256, with_coords=True)
    ea_ref = associate_edges(q, qmask, t, m, params, knn_result=res)
    ea = associate_edges(q, qmask, t, m, params, knn_result=packed)
    np.testing.assert_array_equal(np.asarray(ea.valid), np.asarray(ea_ref.valid))
    np.testing.assert_array_equal(np.asarray(ea.match), np.asarray(ea_ref.match))
    np.testing.assert_allclose(
        np.asarray(ea.line_a), np.asarray(ea_ref.line_a), atol=2e-4
    )

    res_p = knn_run(prep, q, params.num_plane_neighbors,
                    params.max_plane_neighbor_dist, tq=256)
    packed_p = knn_run(prep, q, params.num_plane_neighbors,
                       params.max_plane_neighbor_dist, tq=256, with_coords=True)
    pa_ref = associate_planes(q, qmask, t, m, params, knn_result=res_p)
    pa = associate_planes(q, qmask, t, m, params, knn_result=packed_p)
    np.testing.assert_array_equal(np.asarray(pa.valid), np.asarray(pa_ref.valid))
    np.testing.assert_array_equal(np.asarray(pa.match), np.asarray(pa_ref.match))
    np.testing.assert_allclose(
        np.asarray(pa.normal), np.asarray(pa_ref.normal), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(pa.d), np.asarray(pa_ref.d), atol=2e-4)


@pytest.mark.parametrize("flavour", ["inf", "tight", "loose", "window"])
def test_seed_bound_results_unchanged(flavour):
    """seed_bound only prunes visits: outputs must equal the unseeded
    search bit-for-bit for any sound bound — +inf (no information), the
    true k-th distance (tightest legal), a random loose bound, and the
    production slot-window cold seed."""
    from loam_tpu.ops.knn_pallas import (
        knn_prep, knn_run, seed_bound_from_window, window_candidates,
    )

    queries, targets, mask = _sets(11, 1500, 900)
    k, r = 5, 1.5
    prep = knn_prep(targets, mask)
    base = knn_run(prep, queries, k, r)
    if flavour == "inf":
        bound = jnp.full((queries.shape[0],), jnp.inf, jnp.float32)
    elif flavour == "tight":
        d2 = np.asarray(base.distances) ** 2
        d2 = np.where(np.isfinite(d2), d2, 4.0)
        bound = jnp.asarray(
            (d2[:, k - 1] * 1.000001 + 1e-35).astype(np.float32)
        )
    elif flavour == "loose":
        rng = np.random.default_rng(0)
        d2 = np.where(np.isfinite(np.asarray(base.distances)), np.asarray(base.distances) ** 2, 4.0)
        bound = jnp.asarray(
            (d2[:, k - 1] * (1.0 + rng.random(queries.shape[0])) + 1e-6).astype(np.float32)
        )
    else:
        win = window_candidates(targets, mask, queries.shape[0])
        bound = seed_bound_from_window(queries, *win, k)
    res = knn_run(prep, queries, k, r, seed_bound=bound)
    _assert_same(res, base)


def test_warm_start_registration_matches_unseeded(monkeypatch):
    """The ICF loop with the seed-bound machinery (LOAM_KNN_SEED=1,
    default) must produce the same pose and detail as with it disabled."""
    import os

    import jax

    from loam_tpu import LidarParams, extract_features, register_features
    from loam_tpu.geometry import Pose3
    from loam_tpu.io import render_trajectory
    from loam_tpu.params import FeatureExtractionParams

    lidar = LidarParams(16, 512, 0.5, 80.0)
    scans, _ = render_trajectory(
        lidar, 2, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=3, dtype=np.float32,
    )
    f0 = extract_features(jnp.asarray(scans[0]), lidar, FeatureExtractionParams())
    f1 = extract_features(jnp.asarray(scans[1]), lidar, FeatureExtractionParams())

    monkeypatch.setenv("LOAM_KNN_SEED", "0")
    jax.clear_caches()
    pose_off, det_off = register_features(f1, f0)
    monkeypatch.setenv("LOAM_KNN_SEED", "1")
    jax.clear_caches()
    pose_on, det_on = register_features(f1, f0)

    np.testing.assert_array_equal(
        np.asarray(pose_on.rotation), np.asarray(pose_off.rotation)
    )
    np.testing.assert_array_equal(
        np.asarray(pose_on.translation), np.asarray(pose_off.translation)
    )
    np.testing.assert_array_equal(
        np.asarray(det_on.num_iterations), np.asarray(det_off.num_iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(det_on.iteration_info.plane_match),
        np.asarray(det_off.iteration_info.plane_match),
    )
