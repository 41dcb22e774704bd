"""Feature extraction driver: sector sort + greedy NMS pick.

Reference: ``extractFeatures`` (``features-inl.h:11-50``) with the sector
pickers (``features-inl.h:137-180``). The reference walks each scan line's
sectors in order, sorts each sector slice by curvature, then greedily picks
edge features (descending curvature) and planar features (ascending), where
every accepted feature suppresses (invalidates) points within
``neighbor_points - 1`` indices — including across the *next* sector's
boundary. Sectors within a line are therefore order-dependent; scan lines are
independent (suppression can never cross a line: accepted features always sit
>= neighbor_points from line ends).

TPU mapping:
  * lines  -> ``vmap`` lanes (fully parallel),
  * sectors -> python-unrolled loop carrying the per-line validity mask
    (static per-sector mask windows),
  * the greedy pick -> an unrolled ``lax.scan`` over the sorted sector slots.

Exactness: candidates are prefiltered by threshold only; a candidate that
is masked when visited is a no-op that does not count toward the cap —
exactly the reference's live ``valid_mask[idx]`` check inside its greedy
loop (``features-inl.h:144``). The serial pass therefore walks every sorted
sector slot, but each step touches only a ~(P/S + 2(neighbor_points-1))-wide
STATIC window of the line mask (the sector plus the cross-sector
suppression reach) — the sector loop is python-unrolled so the window
bounds are static. Device profiling showed the greedy steps are
memory-bound on the mask they stream; the windowing cuts that traffic
~number_sectors-fold and removes all per-sector gathers/compactions.

Tie-breaking: the reference uses unstable ``std::sort`` so curvature ties have
implementation-defined order. We pin the canonical order = stable ascending by
(curvature, index) (descending pass = exact reverse). The NumPy oracle uses
the same rule, so oracle/kernel comparisons are exact (SURVEY §7 "sorting
ties").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..params import FeatureExtractionParams, LidarParams
from .curvature import compute_curvature, compute_valid_points, validate_scan
from .types import FeatureSet


def _sector_layout(lidar: LidarParams, params: FeatureExtractionParams):
    """Static (S, S_max) within-line position indices + slot-valid flags.

    Sector s covers [s*pps, (s+1)*pps) except the last which absorbs the
    remainder (``features-inl.h:32-35``).
    """
    P, S = lidar.points_per_line, params.number_sectors
    pps = P // S
    s_max = P - (S - 1) * pps
    pos = np.zeros((S, s_max), dtype=np.int32)
    slot_valid = np.zeros((S, s_max), dtype=bool)
    for s in range(S):
        size = s_max if s == S - 1 else pps
        pos[s, :size] = s * pps + np.arange(size)
        slot_valid[s, :size] = True
        pos[s, size:] = P - 1  # in-bounds dummy for gathers
    return jnp.asarray(pos), jnp.asarray(slot_valid), s_max


def _greedy_pass(
    mask: jax.Array,
    candidates: jax.Array,
    max_feats: int,
    nms_halfwidth: int,
    offset: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Serial greedy pick over ordered candidates.

    TPU note: every step uses only iota-compare/select/reduce vector ops —
    no gather/scatter/dynamic-update primitives, which cost ~100 us each as
    batched XLA ops and made a naive loop two orders of magnitude slower.
    The loop is unrolled (``lax.scan`` unroll) to amortize per-iteration
    control overhead.

    Args:
      mask: (W,) current validity mask (bool) — a width-W window of the line
        starting at point index ``offset`` (the full line when offset=0).
      candidates: (K,) within-line point indices in processing order, -1 pad.
        Every non-negative candidate must lie inside the window.
      max_feats: reference cap; up to ``max_feats + 1`` accepted (§2.3(3)).
      nms_halfwidth: neighbor_points; accept clears idx-(n-1) .. idx+(n-1)
        (clipped to the window — callers size windows to cover the reach).
      offset: window start (static), subtracted from candidate indices for
        mask addressing; picks keep the within-line index.

    Returns: (new_mask, picks (max_feats+1,) int32 with -1 padding).
    """
    cap = max_feats + 1
    W = mask.shape[0]
    picks0 = jnp.full((cap,), -1, dtype=jnp.int32)
    iot = jnp.arange(W, dtype=jnp.int32) + jnp.int32(offset)
    cap_iot = jnp.arange(cap, dtype=jnp.int32)

    def body(state, idx):
        mask, count, picks = state
        # Processing stops exactly after the (max+1)-th accept: a candidate is
        # visited iff count_before <= max (break fires only when count > max).
        live = jnp.any((iot == idx) & mask)
        ok = (idx >= 0) & (count <= max_feats) & live
        picks = jnp.where((cap_iot == count) & ok, idx, picks)
        mask = mask & ~(ok & (jnp.abs(iot - idx) <= nms_halfwidth - 1))
        count = count + ok.astype(jnp.int32)
        return (mask, count, picks), None

    (mask, _, picks), _ = lax.scan(
        body, (mask, jnp.int32(0), picks0), candidates, unroll=8
    )
    return mask, picks


def _nms_impl(mode: str) -> str:
    """Resolve the greedy-NMS impl knob: auto = the bit-packed Pallas kernel
    on a real TPU backend, the XLA windowed scan elsewhere.

    History: the first NMS kernel (round 2) miscompiled at 64x1024
    (seed-dependent wrong picks from sublane-unaligned window slices /
    per-row dynamic loads) and lost its e2e A/B. The round-3 rewrite
    (``ops/nms_pallas.py``) bit-packs the mask 32 points/word, reads
    candidates in aligned groups of 8, and bounds the serial loops by the
    actual candidate counts: hardware-validated exact on 20/20 seeds at
    64x1024 and 3.6x faster than the XLA scan in batched extraction device
    traces (17.5 -> 4.9 ms per 32 frames)."""
    if mode == "auto":
        from ..ops.knn_pallas import pallas_supported

        return "pallas" if pallas_supported() else "xla"
    return mode


def _resolve_sector_sort(mode: str, dtype) -> str:
    """Resolve the sector-sort impl knob: auto = the bitonic network on a
    real TPU backend with f32 keys, the stable ``lax.sort`` elsewhere.
    Shared by :func:`_sector_sort` and the batch fence so they can't
    drift."""
    if mode != "auto":
        return mode
    from ..ops.knn_pallas import pallas_supported

    return (
        "bitonic"
        if (pallas_supported() and dtype == jnp.float32)
        else "xla"
    )


def _sector_sort(c_all, cl_all, pos_b, mode: str):
    """Sort every (line, sector) slice ascending by curvature.

    Returns (sorted hi, sorted lo, sorted positions); lo is zeros when
    ``cl_all`` is None. Two implementations with identical output:

      * ``xla``: one batched stable ``lax.sort`` along the slice axis;
      * ``bitonic``: the VMEM bitonic network (``ops/bitonic.py``) on the
        transposed (slice, line*sector) layout — slices on sublanes, the
        batch on lanes — with position as an explicit last sort key (the
        total order stability otherwise provides, since positions increase
        across each slice and padding rows are fully identical).

    mode: xla|bitonic|auto (from ``FeatureExtractionParams.sector_sort``);
    auto = bitonic on a real TPU backend with f32 keys (the Pallas kernel
    is f32-only), xla elsewhere (the unrolled network is slow to
    compile/run off-TPU).

    NaN keys are out of contract on the bitonic path (NaN compares false
    against everything, freezing those rows mid-network, where lax.sort
    total-orders NaNs last). Curvature is finite for finite scans; scans
    with NaN points are outside both implementations' (and the
    reference's) contract — see ``loam_tpu.debug.check_finite``.
    """
    mode = _resolve_sector_sort(mode, c_all.dtype)
    L, S, m = c_all.shape
    if mode == "bitonic":
        from ..ops.bitonic import bitonic_sort

        c_t = c_all.reshape(L * S, m).T
        pos_t = pos_b.reshape(L * S, m).T
        if cl_all is not None:
            cl_t = cl_all.reshape(L * S, m).T
            sc_t, scl_t, sp_t = bitonic_sort((c_t, cl_t, pos_t), num_keys=3)
        else:
            sc_t, sp_t = bitonic_sort((c_t, pos_t), num_keys=2)
            scl_t = jnp.zeros_like(sc_t)
        back = lambda x: x.T.reshape(L, S, m)
        return back(sc_t), back(scl_t), back(sp_t)
    if cl_all is not None:
        return lax.sort(
            (c_all, cl_all, pos_b), dimension=-1, num_keys=2, is_stable=True
        )
    sc_all, spos_all = lax.sort(
        (c_all, pos_b), dimension=-1, num_keys=1, is_stable=True
    )
    return sc_all, jnp.zeros_like(sc_all), spos_all


@functools.partial(jax.jit, static_argnames=("lidar", "params"))
def extract_features(
    scan: jax.Array,
    lidar: LidarParams,
    params: FeatureExtractionParams = FeatureExtractionParams(),
) -> FeatureSet:
    """Extract LOAM edge/planar features from a range-image scan.

    Args:
      scan: (scan_lines, points_per_line, 3) or flat (L*P, 3) row-major.
    Returns:
      FeatureSet with fixed capacities from ``params`` (slot order matches
      the reference's output order).

    With ``params.precise_selection`` (default) and an f32 scan, all
    selection decisions run in compensated double-float — bit-faithful to
    the reference's f64 selection (see ``curvature.compute_curvature_df``).
    """
    pts = validate_scan(scan, lidar)
    if params.precise_selection and pts.dtype == jnp.float32:
        from .curvature import compute_curvature_df, compute_valid_points_df

        c_hi, c_lo = compute_curvature_df(pts, lidar, params)
        valid = compute_valid_points_df(pts, lidar, params)
        return _extract_core(pts, c_hi, c_lo, valid, lidar, params)
    curv = compute_curvature(pts, lidar, params)  # (L, P)
    valid = compute_valid_points(pts, lidar, params)  # (L, P)
    return extract_features_given(scan, curv, valid, lidar, params)


def _fallback_stage_engaged(
    params: FeatureExtractionParams, dtype
) -> bool:
    """True if any extraction stage resolves to a non-default XLA fallback
    impl (xla sector sort / gather assemble / xla greedy NMS) on a Pallas-
    capable (TPU) backend — the configurations whose VMAPPED forms
    miscompile on the current TPU runtime (see ``extract_features_batch``).

    Resolution must mirror what the stages ACTUALLY run (round-5 review
    fix): ``select_points`` resolves auto to the gather fallback for
    non-f32 data or under ``LOAM_PALLAS_INTERPRET=1``, and interpret mode
    swaps every kernel for its staged-XLA form — so interpret-on-TPU is
    conservatively treated as fallback territory too (only the coverage
    knob hits it; ``lax.map`` is merely slower there, never wrong).
    """
    from ..ops import assemble_pallas as _ap
    from ..ops.knn_pallas import pallas_supported

    if not pallas_supported():
        return False  # CPU forms are oracle-exact under vmap
    if _ap._INTERPRET:
        # interpret mode swaps every kernel for its staged-XLA form (the
        # flag is frozen at import from LOAM_PALLAS_INTERPRET, like each
        # kernel module's own): conservatively fallback territory
        return True
    return (
        _resolve_sector_sort(params.sector_sort, dtype) == "xla"
        or _ap.resolved_assemble_impl(params.feature_assemble, dtype)
        == "gather"
        or _nms_impl(params.greedy_nms) == "xla"
        or dtype != jnp.float32  # non-f32 kernel requests fall back inside
    )


def extract_features_batch(
    scans: jax.Array,
    lidar: LidarParams,
    params: FeatureExtractionParams = FeatureExtractionParams(),
    post=None,
):
    """Batch extraction over a leading frame axis.

    Batching construct: ``jax.vmap`` by default, ``lax.map`` (the single-
    frame program per step) when a known-unsafe configuration is detected
    or forced via ``LOAM_EXTRACT_BATCH`` = "vmap" | "map".

    Why (round-4 hardware finding, scripts/extract_oracle_check.py +
    scripts/vmap_miscompile_repro.py): on the current TPU runtime the
    VMAPPED forms of the non-default XLA fallback stages (xla sector sort,
    gather assemble, XLA greedy-NMS scan) MISCOMPILE — garbage picks at
    Ouster-64 batch scale — while single-frame, CPU, ``lax.map`` and the
    production kernel path (bitonic + pallas assemble + pallas NMS, the
    auto default) are all oracle-exact. Round 4 fenced this only in
    bench.py's safe mode via the env knob; round 5 moves the fence HERE so
    no public-API configuration on TPU can silently return wrong features:
    when any stage resolves to a fallback impl on a TPU backend, batching
    drops to ``lax.map`` automatically. ``LOAM_EXTRACT_BATCH=vmap``
    overrides the fence (hardware A/Bs / re-testing future runtimes only).

    ``post``: optional per-frame post-transform (e.g. azimuth sorting)
    fused into the same batched program.
    """
    from jax import lax as _lax

    def one(s):
        fs = extract_features(s, lidar, params)
        return post(fs) if post is not None else fs

    if _batch_construct(params, scans.dtype) == "map":
        return _lax.map(one, scans)
    return jax.vmap(one)(scans)


def _batch_construct(params: FeatureExtractionParams, dtype) -> str:
    """Resolve the batching construct for ``extract_features_batch``:
    "vmap" unless the miscompile fence engages (or the env knob forces a
    construct). Split out so tests can pin the decision without
    intercepting jax internals."""
    import os as _os

    env = _os.environ.get("LOAM_EXTRACT_BATCH")
    if env in ("map", "vmap"):
        return env
    return "map" if _fallback_stage_engaged(params, dtype) else "vmap"


@functools.partial(jax.jit, static_argnames=("lidar", "params"))
def extract_features_given(
    scan: jax.Array,
    curv: jax.Array,
    valid: jax.Array,
    lidar: LidarParams,
    params: FeatureExtractionParams = FeatureExtractionParams(),
) -> FeatureSet:
    """Feature pick from precomputed curvature (L, P) and validity (L, P).

    Split out so callers (and parity tests) can control the exact curvature
    values fed to the tie-sensitive greedy stage.
    """
    pts = validate_scan(scan, lidar)
    return _extract_core(pts, curv, None, valid, lidar, params)


def _extract_core(
    pts: jax.Array,
    curv: jax.Array,
    curv_lo,
    valid: jax.Array,
    lidar: LidarParams,
    params: FeatureExtractionParams,
) -> FeatureSet:
    """Sector sort + greedy pick. ``curv_lo`` (optional) is the double-float
    low part of the curvature: when given, sorting and threshold comparisons
    are lexicographic on (hi, lo) — the f64 decision order."""
    L, P = lidar.scan_lines, lidar.points_per_line
    N = params.neighbor_points
    S = params.number_sectors
    max_e = params.max_edge_feats_per_sector
    max_p = params.max_planar_feats_per_sector
    curv = curv.reshape(L, P)
    valid = valid.reshape(L, P)

    # slot validity is derived from the +inf sort key downstream; the
    # layout's flags are unused here
    pos_all, _, s_max = _sector_layout(lidar, params)
    pps = P // S

    # Sort ALL (line, sector) slices in ONE batched sort, hoisted out of the
    # sector scan (the sort does not depend on the evolving NMS mask).
    # Position and slot-validity ride along as sort values — no post-sort
    # gathers (TPU gathers are expensive). The precise path sorts
    # lexicographically on the double-float (hi, lo) pair; stability (or the
    # position tie-break key on the bitonic path — same total order, since
    # positions increase across each slice) pins the oracle's canonical
    # (curvature, index) tie order.
    # Sector slicing is pure static slices + pads (sectors are contiguous
    # ranges; only the last absorbs the remainder) — no (L, P) gather.

    def to_sectors(x2d, fill):
        parts = []
        for s in range(S):
            size = s_max if s == S - 1 else pps
            sl = lax.slice_in_dim(x2d, s * pps, s * pps + size, axis=1)
            if size < s_max:
                sl = jnp.pad(
                    sl, ((0, 0), (0, s_max - size)), constant_values=fill
                )
            parts.append(sl)
        return jnp.stack(parts, axis=1)  # (L, S, s_max)

    c_all = to_sectors(curv, jnp.inf)  # padding slots carry +inf keys
    pos_b = jnp.broadcast_to(pos_all[None], c_all.shape)
    if curv_lo is not None:
        cl = curv_lo.reshape(L, P)
        # canonicalize -0.0 lo parts: hi + (-0.0) and hi + (+0.0) are the
        # SAME f64 value, but lax.sort's total order puts -0.0 first while
        # the bitonic comparator (correctly, matching the f64 oracle's tie
        # semantics) treats them equal and falls to the position tie-break
        cl = jnp.where(cl == 0, jnp.asarray(0.0, cl.dtype), cl)
        cl_all = to_sectors(cl, 0.0)
    else:
        cl_all = None
    sc_all, sc_lo_all, spos_all = _sector_sort(
        c_all, cl_all, pos_b, params.sector_sort
    )
    # slot validity needs no sort operand: padding slots (and only they)
    # carry the +inf key — real curvature is finite (bounded sums of squares)
    ssv_all = sc_all < jnp.inf

    if curv_lo is not None:
        from ..ops import twofloat as tf

        et = tf.df_from_scalar(params.edge_feat_threshold)
        pt = tf.df_from_scalar(params.planar_feat_threshold)

        def above_edge(hi, lo):
            return (hi > et.hi) | ((hi == et.hi) & (lo > et.lo))

        def below_planar(hi, lo):
            return (hi < pt.hi) | ((hi == pt.hi) & (lo < pt.lo))

    else:
        edge_thresh = jnp.asarray(params.edge_feat_threshold, curv.dtype)
        planar_thresh = jnp.asarray(params.planar_feat_threshold, curv.dtype)

        def above_edge(hi, lo):
            return hi > edge_thresh

        def below_planar(hi, lo):
            return hi < planar_thresh

    # Candidate lists, hoisted: threshold-prefiltered sorted positions per
    # (line, sector, class); -1 = not a candidate. Edge pass walks
    # descending curvature = reversed stable-sorted order.
    cand_e_all = jnp.where(above_edge(sc_all, sc_lo_all) & ssv_all, spos_all, -1)[
        ..., ::-1
    ]
    cand_p_all = jnp.where(below_planar(sc_all, sc_lo_all) & ssv_all, spos_all, -1)

    # Sector loop is PYTHON-unrolled (S is static): every sector's greedy
    # passes then operate on a STATIC slice of the line mask — the sector's
    # span plus an (N-1)-point margin each side (the reach of cross-sector
    # suppression, §2.3(4)) — instead of the full line. Device profiling
    # showed the serial greedy steps are memory-bound on the mask they
    # stream each step; a ~(P/S)-wide slice cuts that traffic ~S-fold.
    # Candidates are threshold-prefiltered only (no mask gather, no
    # compaction): a candidate that is masked (or suppressed later) is
    # visited as a no-op that does not count toward the cap — exactly the
    # reference's live ``valid_mask[idx]`` check (``features-inl.h:144``).
    # On TPU the whole serial stage runs as ONE Pallas kernel with the
    # evolving mask resident in VMEM (ops/nms_pallas.py) — identical
    # output; the XLA fallback scans per line below.
    if _nms_impl(params.greedy_nms) == "pallas":
        from ..ops.nms_pallas import greedy_nms

        edge_picks, planar_picks = greedy_nms(
            valid, cand_e_all, cand_p_all, max_e, max_p, N, pps, s_max
        )
    else:
        def line_fn(valid_l, cand_e_l, cand_p_l):
            mask = valid_l
            e_picks, p_picks = [], []
            for s in range(S):
                size = s_max if s == S - 1 else pps
                lo = max(s * pps - (N - 1), 0)
                hi = min(s * pps + size + (N - 1), P)
                msl = lax.slice_in_dim(mask, lo, hi, axis=0)

                msl, pe = _greedy_pass(msl, cand_e_l[s], max_e, N, offset=lo)
                msl, pp_ = _greedy_pass(msl, cand_p_l[s], max_p, N, offset=lo)

                mask = lax.dynamic_update_slice_in_dim(mask, msl, lo, axis=0)
                e_picks.append(pe)
                p_picks.append(pp_)
            return jnp.stack(e_picks), jnp.stack(p_picks)

        edge_picks, planar_picks = jax.vmap(line_fn)(
            valid, cand_e_all, cand_p_all
        )

    line_offsets = (jnp.arange(L, dtype=jnp.int32) * P)[:, None, None]

    def flat_meta(picks, cap_total):
        flat_idx = jnp.where(picks >= 0, picks + line_offsets, -1).reshape(cap_total)
        return flat_idx >= 0, flat_idx

    e_cap = params.edge_capacity(lidar)
    p_cap = params.planar_capacity(lidar)
    em, ei = flat_meta(edge_picks, e_cap)
    pm, pi = flat_meta(planar_picks, p_cap)

    # Coordinate copy-out: one fused per-line selection over BOTH classes
    # (iota-compare + sublane reduce in a Pallas kernel on TPU — XLA lowers
    # the equivalent gather to a serialized ~2.2 ms op at Ouster-64 scale;
    # see ops/assemble_pallas.py). Negative picks yield zero rows, matching
    # the masked-padding convention.
    from ..ops.assemble_pallas import select_points

    e_flat = edge_picks.reshape(L, -1)
    ce = e_flat.shape[1]
    cat = jnp.concatenate([e_flat, planar_picks.reshape(L, -1)], axis=1)
    sel = select_points(pts, cat, impl=params.feature_assemble)
    ep = sel[:, :ce].reshape(e_cap, 3)
    pp = sel[:, ce:].reshape(p_cap, 3)
    return FeatureSet(ep, em, ei, pp, pm, pi)
