"""Fused brute-force kNN Pallas kernel.

Replaces the XLA path's HBM-materialized (Q, M) distance matrix + k argmin
re-reads (~15 GB of HBM traffic for 19.5k x 19.5k) with a single kernel that
keeps everything in VMEM: per query tile, loop over target chunks — the VPU
computes squared distances by direct coordinate differences (exact f32; the
MXU cross-term form is 2%-utilized at K=3 and numerically worse) and
maintains a running top-k per query. HBM traffic drops to reading
queries/targets once per tile.

Layout note: distances are (targets, queries) = (sublanes, lanes) so every
reduction (min/argmin over targets) runs along SUBLANES — much cheaper on
the VPU than the lane-axis reductions that dominated the first version of
this kernel.

Semantics identical to ``bruteforce.knn``/``topk_min``: ascending distance,
first-index tie-breaking (within a chunk argmin takes the first minimum;
across chunks the merge prefers the running list, which holds lower target
indices), invalid targets (additive +inf mask) never selected.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

# Tile-size knobs (static shapes; env overrides for hardware sweeps; unset
# means auto-select per target size, see _auto_tiles).
_TQ = os.environ.get("LOAM_KNN_TQ")
_TT = os.environ.get("LOAM_KNN_TT")


def default_tt(m: int) -> int:
    """Chunk length knn_prep uses for an m-point target (env override or
    per-scale auto) — callers reconstructing a TargetPrep from carried
    arrays must use THIS, not _auto_tiles directly, to stay consistent."""
    return int(_TT or _auto_tiles(m)[1])


def _auto_tiles(m: int) -> tuple:
    """Measured v5e optimum (round-3 trace sweeps on CORRECT features —
    earlier sweeps ran on the miscompiled batched-extraction workload).

    Scan-scale (17k x 17k planar search): (1024, 256) wins — 2.07 ms vs
    2.15-2.24 for smaller tiles; per-visit overhead eats the element
    savings of finer culling. Map-scale (sparse-valid padded map targets):
    (512, 128) wins by ~24% (1.27 vs 1.68 ms) — finer chunks cull the
    mostly-empty buffer much harder. Chunk length below 128 cannot lower
    (dynamic lane-dim slices need 128-multiple offsets).
    """
    if m >= 32768:
        return 512, 128
    return 1024, 256

# Interpret mode runs the kernel as plain XLA on any backend — slow, but it
# lets the CPU test suite cover the kernel body + the jit-level prep
# (padding, bbox ranges, dual-class index remapping) that only executes on
# TPU in production. Set LOAM_PALLAS_INTERPRET=1 (tests do).
_INTERPRET = os.environ.get("LOAM_PALLAS_INTERPRET", "0") == "1"


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    """Pallas TPU kernels need a real TPU backend and f32 data."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _pack_active_lists(active: jax.Array, sep2: jax.Array = None):
    """Left-pack active chunk indices: (T, C) bool -> ((T, C) int32 lists,
    (T, 1) counts).

    A stable argsort of the inactive flags gives the same result, but
    ``lax.sort`` is a fixed-cost unfused op on TPU (~1 ms standalone); the
    rank-counting + one-hot reduce here is pure elementwise+reduction work
    that XLA fuses; ``lst[t, i] = sum_j [dest[t, j] == i] * j`` never
    materializes the (T, C, C) one-hot.

    With ``sep2`` (the (T, C) bbox separation used for culling) lists come
    NEAREST-FIRST (ties by chunk index): the kernel's running top-k then
    tightens as fast as possible, so its per-visit lower-bound gate
    (see ``_knn_kernel``) skips the bulk of the remaining visits. Without
    it, ascending chunk order. Result order does not affect output values:
    the kernel's merge breaks distance ties by global index, which is
    visit-order invariant.
    """
    n_chunks = active.shape[1]
    if sep2 is None:
        dest = jnp.cumsum(active, axis=1, dtype=jnp.int32) - 1
        dest = jnp.where(active, dest, -1)  # (T, C)
    else:
        # rank among active chunks by (sep2, index) lexicographic order
        key = jnp.where(active, sep2, jnp.inf)
        jj2 = jnp.arange(n_chunks, dtype=jnp.int32)
        earlier = (key[:, None, :] < key[:, :, None]) | (
            (key[:, None, :] == key[:, :, None])
            & (jj2[None, None, :] < jj2[None, :, None])
        )  # (T, C_j, C_other): other strictly before j
        rank = jnp.sum(
            earlier & active[:, None, :], axis=2, dtype=jnp.int32
        )
        dest = jnp.where(active, rank, -1)
    jj = jnp.arange(n_chunks, dtype=jnp.int32)
    eq = dest[:, None, :] == jj[None, :, None]  # (T, C_out, C_j)
    lst = jnp.sum(
        jnp.where(eq, jj[None, None, :], 0), axis=2, dtype=jnp.int32
    )
    cnt = jnp.sum(active, axis=1, dtype=jnp.int32)[:, None]
    return lst, cnt


def _extract_k_rows(d2, row, k):
    """k smallest of d2 (W, TQ) along axis 0 -> ((k, TQ) values, (k, TQ)
    rows), ascending, first-index ties. Unrolled min/argmin sublane passes."""
    vs, rs = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=0)
        am = jnp.argmin(d2, axis=0).astype(jnp.int32)
        vs.append(m)
        rs.append(am)
        d2 = jnp.where(row == am[None, :], jnp.inf, d2)
    return jnp.stack(vs, axis=0), jnp.stack(rs, axis=0)


def _knn_kernel(
    q_ref, t_ref, rot_ref, rbox_ref, cnt_ref, lst_ref,
    *refs,
    k: int, tt: int, use_list: bool, with_coords: bool = False,
    init_v: float = float("inf"), n_sub: int = 1, with_bound: bool = False,
    count_visits: bool = False,
):
    """Top-k body with ADAPTIVE culling (see knn_run for the jit-level half).

    Running top-k state lives in VMEM scratch so each visit can be gated
    with ``pl.when``: before touching a chunk's (TT, TQ) tile, a per-query
    LOWER BOUND on the distance to anything in the chunk (point-to-bbox,
    computed from 6 SMEM scalars) is compared against each query's current
    k-th best — when no query can improve, the whole distance + extraction
    + merge body is skipped at ~tq ops. Visits arrive nearest-chunk-first
    (``_pack_active_lists`` with sep2), so the running k-th bests tighten
    in the first few visits and the gate then prunes the long tail that
    bbox-vs-bbox prefiltering keeps (measured: ~70-90% of visits at scan
    scale — full-range azimuth wedges overlap near the sensor, so ~27% of
    all chunks pass the jit-level prefilter but almost none survive the
    running-best test).

    Exactness: the bound never exceeds a true distance, and skipping
    requires lb >= kth for EVERY query, so no skipped chunk could alter any
    top-k list (a tie lb == kth is kept: an equal-distance lower-index
    candidate must still win). Distance ties break by GLOBAL index in the
    merge (lexicographic (value, index) min), which makes results
    visit-order invariant — identical to XLA ``topk_min``'s ascending
    (distance, first-index) semantics.
    """
    if with_bound:
        # (1, TQ) per-query UPPER bound on the k-th smallest d^2, from seed
        # candidates recomputed at the jit level (see seed_bound helpers).
        # Only the gate reads it; results never copy seed values, so a loose
        # or stale bound costs visits, never correctness.
        bnd_ref, *refs = refs
    n_coord = 3 if with_coords else 0
    idx_ref, d2_ref, *rest_refs = refs
    coord_refs = rest_refs[:n_coord]
    vcount_ref = None
    nx = n_coord
    if count_visits:  # debug output: executed chunk_work calls per tile
        vcount_ref = rest_refs[nx]
        vcount_ref[...] = jnp.zeros_like(vcount_ref)
        nx += 1
    sv = rest_refs[nx]  # (k, TQ) f32 scratch: running best distances
    si = rest_refs[nx + 1]  # (k, TQ) i32 scratch: global indices
    sc = rest_refs[nx + 2 : nx + 2 + n_coord]

    q = q_ref[...]  # (3, TQ)
    tq = q.shape[1]
    assert tq % n_sub == 0
    sw = tq // n_sub  # sub-block width (lane granularity: keep >= 128)
    m_total = t_ref.shape[1]
    # hoisted: program_id inside a lax.cond/fori_loop closure stages the
    # primitive into the branch jaxpr, which interpret mode can't evaluate
    tile = pl.program_id(0)
    row = lax.broadcasted_iota(jnp.int32, (tt, sw), 0)
    qx = q[0][None, :]
    qy = q[1][None, :]
    qz = q[2][None, :]

    # Slots start at the RADIUS BOUND r^2 (init_v) rather than +inf when a
    # radius filter applies: any candidate at d^2 >= r^2 is discarded by the
    # jit-level ``sqrt(d2) < max_dist`` filter anyway, so keeping the k-th
    # best <= r^2 from the first visit changes no valid output — but it
    # closes the gate permanently on queries with fewer than k in-radius
    # neighbors (whose k-th best otherwise stays +inf and attracts every
    # remaining visit).
    sv[...] = jnp.full((k, tq), init_v, jnp.float32)
    si[...] = jnp.zeros((k, tq), jnp.int32)
    for a in range(n_coord):
        sc[a][...] = jnp.zeros((k, tq), jnp.float32)

    imax = jnp.int32(2147483647)

    def chunk_work(c, s):
        """Chunk c against query sub-block s (columns [s*sw, (s+1)*sw))."""
        lo = s * sw
        off = c * tt
        if count_visits:
            # whole-row add: Mosaic rejects scalar VMEM stores; every column
            # carries the same count, readers take column 0
            vcount_ref[...] = vcount_ref[...] + 1
        t = t_ref[:, pl.ds(off, tt)]  # (3, TT)
        # invalid target slots carry +3e37 sentinel coordinates (knn_prep),
        # so their squared distances overflow to +inf with no separate
        # invalidation row — one load and one add per element saved
        dx = t[0][:, None] - qx[:, lo : lo + sw]
        dy = t[1][:, None] - qy[:, lo : lo + sw]
        dz = t[2][:, None] - qz[:, lo : lo + sw]
        d2 = dx * dx + dy * dy + dz * dz  # (TT, SW)
        # k extraction passes; with_coords also selects the chosen rows'
        # coordinates (exact copies of t — no arithmetic), so callers skip
        # the XLA neighbor gather entirely (the largest per-iteration cost
        # of the ICF loop when measured on v5e). The selection rides the
        # MXU: one-hot (exactly one 1.0 per column) x f32 coords under
        # HIGHEST precision has a single product per output — exact, and
        # ~4x cheaper than three VPU where+sum sweeps over the (TT, TQ)
        # tile (hardware trace: 2.42 -> 1.4 ms for the 17k x 17k planar
        # search).
        cvs, crs, ccs = [], [], ([], [], [])
        dd = d2
        for _ in range(k):
            m = jnp.min(dd, axis=0)
            am = jnp.argmin(dd, axis=0).astype(jnp.int32)
            sel = row == am[None, :]
            cvs.append(m)
            crs.append(am)
            if with_coords:
                cc = lax.dot_general(
                    t, sel.astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (3, TQ)
                for a in range(3):
                    ccs[a].append(cc[a])
            dd = jnp.where(sel, jnp.inf, dd)
        cv = jnp.stack(cvs, axis=0)
        # pin int32: under x64 interpret mode the loop index / sum promote
        ci = (jnp.stack(crs, axis=0) + off).astype(jnp.int32)
        # merge running + chunk candidates on lexicographic (value, index):
        # global first-index tie-breaking independent of visit order
        mv = jnp.concatenate([sv[:, lo : lo + sw], cv], axis=0)  # (2k, SW)
        mi = jnp.concatenate([si[:, lo : lo + sw], ci], axis=0)
        if with_coords:
            mc = [
                jnp.concatenate(
                    [sc[a][:, lo : lo + sw], jnp.stack(ccs[a], axis=0)], axis=0
                )
                for a in range(3)
            ]
        nv, ni = [], []
        nc = ([], [], [])
        for _ in range(k):
            m = jnp.min(mv, axis=0)
            isval = mv == m[None, :]
            wi = jnp.min(jnp.where(isval, mi, imax), axis=0)
            sel = isval & (mi == wi[None, :])
            nv.append(m)
            ni.append(wi)
            if with_coords:
                for a in range(3):
                    nc[a].append(jnp.sum(jnp.where(sel, mc[a], 0.0), axis=0))
            mv = jnp.where(sel, jnp.inf, mv)
        sv[:, lo : lo + sw] = jnp.stack(nv, axis=0)
        si[:, lo : lo + sw] = jnp.stack(ni, axis=0)
        for a in range(n_coord):
            sc[a][:, lo : lo + sw] = jnp.stack(nc[a], axis=0)

    def do_chunk(c):
        # Point-to-box lower bound per query, in the CHUNK's OWN rotated
        # frame (u along the chunk's center azimuth, v across, z up): an
        # azimuth-sorted chunk is a thin full-range wedge whose axis-aligned
        # bbox is mostly empty space on diagonal azimuths — rotating makes
        # it a tight slab, so the bound approaches the true distance.
        # Rotation is an isometry, so the bound stays exact. 8 SMEM scalar
        # loads; an all-invalid chunk has an inverted +/-big box whose gap
        # squares overflow to +inf and the gate skips it; +3e37 sentinel
        # queries (masked slots) overflow the same way.
        cx = rot_ref[0, c]
        cy = rot_ref[1, c]
        uq = cx * qx + cy * qy
        vq = cx * qy - cy * qx
        gu = jnp.maximum(jnp.maximum(rbox_ref[0, c] - uq, uq - rbox_ref[1, c]), 0.0)
        gv = jnp.maximum(jnp.maximum(rbox_ref[2, c] - vq, vq - rbox_ref[3, c]), 0.0)
        gz = jnp.maximum(jnp.maximum(rbox_ref[4, c] - qz, qz - rbox_ref[5, c]), 0.0)
        lb = gu * gu + gv * gv + gz * gz  # (1, TQ)
        kth = sv[pl.ds(k - 1, 1), :]  # (1, TQ)
        if with_bound:
            kth = jnp.minimum(kth, bnd_ref[...])
        # <= so a chunk whose bound TIES the k-th best is still visited: it
        # may hold an equal-distance lower-index candidate that must win
        # the lexicographic merge (extreme points sit exactly on their
        # chunk's bbox, so lb == d happens on axis-aligned geometry).
        improving = (lb <= kth).astype(jnp.int32)

        # Gate per query SUB-BLOCK: a chunk near the tile's span always has
        # SOME improvable query, so a whole-tile gate admits ~every in-span
        # chunk for all tq columns; sub-block gates shrink the processed
        # columns to the chunk's own neighborhood (the k-th-best reach),
        # cutting (TT, tq) element work to (TT, sw) on the blocks that
        # matter. Per-column exactness is unchanged.
        for s in range(n_sub):
            imp_s = improving[:, s * sw : (s + 1) * sw]

            @pl.when(jnp.max(imp_s) > 0)
            def _(c=c, s=s):
                chunk_work(c, s)

    def visit(j, carry):
        do_chunk(lst_ref[tile, j] if use_list else j)
        return carry

    if use_list:
        # (A round-5 experiment unrolled this loop by 2-4 entries per
        # iteration, padding lists with a synthetic always-closed chunk —
        # exact, and measured NEUTRAL: 1.461 / 1.456 / 1.461 ms/scan
        # device e2e for U=1/2/4, interleaved medians. fori_loop
        # bookkeeping is NOT a material per-visit cost; pruned.)
        lax.fori_loop(0, cnt_ref[tile, 0], visit, jnp.int32(0))
    else:
        lax.fori_loop(0, m_total // tt, visit, jnp.int32(0))
    idx_ref[...] = si[...]
    d2_ref[...] = sv[...]
    for a in range(n_coord):
        coord_refs[a][...] = sc[a][...]


class TargetPrep(NamedTuple):
    """Loop-invariant target-side state of :func:`knn_run`.

    The ICF loop searches FIXED targets with moving queries (the reference
    builds its KD-trees once, ``registration-inl.h:20-23``); building this
    once above the loop keeps the target pad/transpose/bounding-box work —
    a measurable slice of per-call time at feature scale — out of every
    iteration. Int fields are static shape metadata: keep the tuple inside
    one trace (do not pass across a jit boundary).
    """

    tT: jax.Array  # (3, mpad) padded transposed targets (+3e37 at invalid)
    rot: jax.Array  # (2, n_chunks) unit chunk-frame direction (cx, cy)
    rbox: jax.Array  # (6, n_chunks) chunk box in its frame: u/v/z lo,hi
    m: int  # true target count
    tt: int  # chunk length


def _chunk_frames(tch: jax.Array, vch: jax.Array):
    """Per-chunk ROTATED bounding boxes: (2, C) unit direction + (6, C) box.

    ``tch``: (3, C, tt) chunked targets, ``vch``: (1, C, tt) validity. Each
    chunk gets its own xy frame aligned with its mean direction (u along,
    v across, z unchanged) — an azimuth-sorted chunk is a thin full-range
    wedge, so the rotated box is a tight slab where the axis-aligned box of
    a diagonal wedge is mostly empty space. Rotation is an isometry: any
    unit direction yields correct (conservative-exact) bounds; all-invalid
    chunks get an inverted +/-big box that gates every visit off.
    """
    dtype = tch.dtype
    big = jnp.asarray(3e37, dtype)
    tx, ty, tz = tch[0], tch[1], tch[2]  # (C, tt)
    v = vch[0]
    sx = jnp.sum(jnp.where(v, tx, 0.0), axis=1)
    sy = jnp.sum(jnp.where(v, ty, 0.0), axis=1)
    nrm = jnp.sqrt(sx * sx + sy * sy)
    ok = nrm > 0
    cx = jnp.where(ok, sx / jnp.where(ok, nrm, 1.0), 1.0)  # (C,)
    cy = jnp.where(ok, sy / jnp.where(ok, nrm, 1.0), 0.0)
    u = cx[:, None] * tx + cy[:, None] * ty  # (C, tt)
    w = cx[:, None] * ty - cy[:, None] * tx

    def lohi(a):
        return (
            jnp.min(jnp.where(v, a, big), axis=1),
            jnp.max(jnp.where(v, a, -big), axis=1),
        )

    ulo, uhi = lohi(u)
    vlo, vhi = lohi(w)
    zlo, zhi = lohi(tz)
    rot = jnp.stack([cx, cy], axis=0)
    rbox = jnp.stack([ulo, uhi, vlo, vhi, zlo, zhi], axis=0)
    return rot, rbox


def _tile_gaps(qlo, qhi, rot, rbox):
    """Squared tile-box/chunk-box separation in each chunk's frame.

    ``qlo``/``qhi``: (3, T) tile bounds; returns (T, C) sep^2 plus a (T,)
    tile-nonempty flag (an empty tile's inverted bounds would otherwise
    produce a giant interval in the rotated frame and activate everything).
    """
    cx, cy = rot[0], rot[1]  # (C,)
    # u/v extremes of the tile's xy-rectangle = extremes over its 4 corners;
    # for a linear map those split per-axis: u = cx*x + cy*y
    def interval(ax, ay):
        lo = (
            jnp.minimum(ax[:, None] * qlo[0][None, :], ax[:, None] * qhi[0][None, :])
            + jnp.minimum(ay[:, None] * qlo[1][None, :], ay[:, None] * qhi[1][None, :])
        )  # (C, T)
        hi = (
            jnp.maximum(ax[:, None] * qlo[0][None, :], ax[:, None] * qhi[0][None, :])
            + jnp.maximum(ay[:, None] * qlo[1][None, :], ay[:, None] * qhi[1][None, :])
        )
        return lo, hi

    tulo, tuhi = interval(cx, cy)
    tvlo, tvhi = interval(-cy, cx)

    def gap(alo, ahi, blo, bhi):
        return jnp.maximum(jnp.maximum(blo - ahi, alo - bhi), 0.0)

    gu = gap(tulo, tuhi, rbox[0][:, None], rbox[1][:, None])  # (C, T)
    gv = gap(tvlo, tvhi, rbox[2][:, None], rbox[3][:, None])
    gz = gap(qlo[2][None, :], qhi[2][None, :], rbox[4][:, None], rbox[5][:, None])
    sep2 = (gu * gu + gv * gv + gz * gz).T  # (T, C)
    nonempty = qhi[0] >= qlo[0]  # (T,)
    return sep2, nonempty


def knn_prep(
    targets: jax.Array, target_mask: jax.Array, tt: int = None
) -> TargetPrep:
    """Build the target-side state for :func:`knn_run` (pad + transpose +
    per-chunk rotated bounding boxes; static-shape pads, no update-slices).

    Invalid and padding slots are stored as +3e37 sentinel coordinates: their
    squared distances overflow to +inf inside the kernel, replacing the
    separate additive-invalidation row (one load + one add per element)."""
    dtype = jnp.float32
    M = targets.shape[0]
    tt = tt or int(_TT or _auto_tiles(M)[1])
    mpad = max(-(-M // tt) * tt, tt)
    big = jnp.asarray(3e37, dtype)
    t = jnp.where(target_mask[:, None], targets.astype(dtype), big)
    tT = jnp.pad(t.T, ((0, 0), (0, mpad - M)), constant_values=3e37)
    n_chunks = mpad // tt
    tvalid = jnp.pad(target_mask, (0, mpad - M))
    tch = tT.reshape(3, n_chunks, tt)
    vch = tvalid.reshape(n_chunks, tt)[None]
    rot, rbox = _chunk_frames(tch, vch)
    return TargetPrep(tT, rot, rbox, M, tt)


class PackedKnn(NamedTuple):
    """kNN result in kernel-native packed layout.

    Skips every (Q, k) transpose AND the neighbor-coordinate gather: the
    kernel one-hot-reduces the selected rows' coordinates in VMEM (exact
    copies), so association can fit lines/planes straight from these arrays
    (``geometry.fit_line_packed`` / ``fit_plane_packed``).
    """

    first_idx: jax.Array  # (Q,) nearest target index (garbage if no match)
    mask: jax.Array  # (k, Q) slot validity (finite + radius)
    xs: jax.Array  # (k, Q) neighbor coordinates (garbage where ~mask)
    ys: jax.Array
    zs: jax.Array


#: Relative inflation applied to every seed bound: the bound is recomputed
#: at the jit level while the kernel recomputes distances in its own Mosaic
#: codegen; fma-vs-mul+add rounding can skew the same expression by a few
#: ulps, and the bound must stay an UPPER bound in kernel arithmetic for the
#: gate to be exact. ~8 ulps of slack (plus a denormal-scale absolute term)
#: costs a negligible number of extra visits.
_BOUND_SLACK = 1.000001


def kth_smallest_bound(d2: jax.Array, k: int) -> jax.Array:
    """Sound (Q,) upper bound on the k-th smallest of ``d2`` (W, Q) candidate
    squared distances (+inf entries = invalid candidates).

    k-1 min-extraction passes then a final min. Duplicated minima are masked
    together, which can only push the result TOWARD LARGER values (or +inf
    when fewer than k distinct survive) — i.e. looser, never unsound.
    """
    d = d2
    for _ in range(k - 1):
        m = jnp.min(d, axis=0)
        d = jnp.where(d == m[None, :], jnp.inf, d)
    b = jnp.min(d, axis=0)
    return b * _BOUND_SLACK + jnp.float32(1e-35)


def seed_bound_from_packed(
    queries: jax.Array, xs, ys, zs, mask
) -> jax.Array:
    """(Q,) k-th-distance bound from a previous :class:`PackedKnn` result
    whose coordinates are still valid target points (the ICF warm start:
    targets are fixed across iterations; only the queries moved).

    The bound is the max over the k candidates' CURRENT squared distances
    when all k slots are valid, else +inf (fewer than k in-radius neighbors
    last iteration means the running init r^2 is already the best bound).
    """
    dx = queries[:, 0][None, :] - xs
    dy = queries[:, 1][None, :] - ys
    dz = queries[:, 2][None, :] - zs
    d2 = dx * dx + dy * dy + dz * dz  # (k, Q)
    b = jnp.max(d2, axis=0) * _BOUND_SLACK + jnp.float32(1e-35)
    return jnp.where(jnp.all(mask, axis=0), b, jnp.inf)


def window_candidates(
    targets: jax.Array,
    target_mask: jax.Array,
    q_count: int,
    w: int = 8,
):
    """Cold-seed candidates for two azimuth-sorted feature sets of equal
    capacity: the targets at the SAME slot rank +/- w/2 as each query slot
    (consecutive scans place corresponding returns at nearly equal sorted
    ranks, so slot-aligned windows are within sampling pitch + motion of the
    true neighbors, with NO gather — w rolls = static slices).

    Returns loop-invariant ``(xs, ys, zs, ok)``, each (w, q_count): hoist
    above the ICF while_loop and feed :func:`seed_bound_from_window` with
    the CURRENT (moved) queries every iteration. Misaligned orderings (e.g.
    a Morton-keyed map target) only loosen the bound — never unsound."""
    Q = q_count
    M = targets.shape[0]
    n = min(Q, M)
    cs, oks = [], []
    for off in range(-(w // 2), w - w // 2):
        t = jnp.roll(targets, -off, axis=0)[:n]
        m = jnp.roll(target_mask, -off)[:n]
        j = jnp.arange(n) + off
        ok = m & (j >= 0) & (j < M)
        cs.append(jnp.pad(t, ((0, Q - n), (0, 0))))
        oks.append(jnp.pad(ok, (0, Q - n)))
    c = jnp.stack(cs, axis=0)  # (w, Q, 3)
    return c[:, :, 0], c[:, :, 1], c[:, :, 2], jnp.stack(oks, axis=0)


def seed_bound_from_window(queries, xs, ys, zs, ok, k: int) -> jax.Array:
    """(Q,) k-th-distance bound from :func:`window_candidates` at the
    CURRENT query positions (includes the soundness slack)."""
    dx = queries[:, 0][None, :] - xs
    dy = queries[:, 1][None, :] - ys
    dz = queries[:, 2][None, :] - zs
    d2 = jnp.where(ok, dx * dx + dy * dy + dz * dz, jnp.inf)
    return kth_smallest_bound(d2, k)


def knn_run(
    prep: TargetPrep,
    queries: jax.Array,
    k: int,
    max_dist: float = 0.0,
    tq: int = None,
    with_coords: bool = False,
    query_mask: jax.Array = None,
    seed_bound: jax.Array = None,
    return_visits: bool = False,
):
    """Query-side half of :func:`knn_pallas` against prebuilt targets.

    ``with_coords=True`` returns a :class:`PackedKnn` (kernel-layout result
    with neighbor coordinates) instead of a ``KnnResult``.

    ``query_mask``: optional (Q,) validity of query slots. Invalid slots are
    moved to a far sentinel (+3e37) before tiling, so their per-query lower
    bound overflows to +inf and the kernel's gate skips every visit on their
    behalf (a tile of only invalid slots does zero chunk work); the tile
    bounding boxes ignore them, so mixed tiles stay tight. Their returned
    neighbor lists are empty — callers that pass a mask must not read
    results for masked slots (the ICF association masks them regardless).

    ``seed_bound``: optional (Q,) f32 UPPER bound on each query's k-th
    smallest squared distance (+inf where unknown), e.g. from
    :func:`seed_bound_from_packed` (warm start across ICF iterations) or
    :func:`kth_smallest_bound` over cheap candidates. The kernel gates each
    chunk visit on ``lb <= min(running kth, seed_bound)``; since the bound
    is derived from genuine target points, no chunk holding a true top-k
    element is ever skipped (d_e <= true_kth <= bound while a skip needs
    lb > bound >= d_e >= lb), so results are EXACTLY unchanged — a tight
    bound only removes visits. Results never copy seed values: stale or
    loose bounds cost time, never correctness.

    (History: a round-4 ``slab_chunks`` mode visited slot-aligned chunks
    unconditionally — 2.5x on the standalone kernel for COLD queries but a
    consistent ~15% e2e REGRESSION in the warm motion-prior regime the
    production drivers run; pruned in round 5 per the win-or-prune rule,
    see docs/PERFORMANCE.md.)
    """
    from ..neighbors.bruteforce import KnnResult

    Q = queries.shape[0]
    tt = prep.tt
    mpad = prep.tT.shape[1]
    tq = tq or int(_TQ or _auto_tiles(mpad)[0])
    dtype = jnp.float32
    qpad = -(-Q // tq) * tq
    big = jnp.asarray(3e37, dtype)
    queries = queries.astype(dtype)
    if query_mask is not None:
        queries = jnp.where(query_mask[:, None], queries, big)
    qT = jnp.pad(queries.T, ((0, 0), (0, qpad - Q)))

    n_chunks = mpad // tt
    n_tiles = qpad // tq
    qch = qT.reshape(3, n_tiles, tq)
    qvalid = jnp.arange(qpad) < Q
    if query_mask is not None:
        qvalid = qvalid & jnp.pad(query_mask, (0, qpad - Q))
    qvalid = qvalid.reshape(1, n_tiles, tq)
    qlo = jnp.min(jnp.where(qvalid, qch, big), axis=2)  # (3, n_tiles)
    qhi = jnp.max(jnp.where(qvalid, qch, -big), axis=2)

    # Per-tile ACTIVE CHUNK LIST: the exact set of chunks whose (rotated)
    # bounding box is within the radius of the tile's query box (anything
    # else cannot contribute a match under the strict < max_dist filter),
    # ordered NEAREST-FIRST so the kernel's running-best gate prunes the
    # tail (see _knn_kernel; tie order does not affect outputs — the merge
    # breaks distance ties by global index).
    r2 = float(max_dist) ** 2 if max_dist > 0 else 0.0
    if r2 > 0:
        sep2, nonempty = _tile_gaps(qlo, qhi, prep.rot, prep.rbox)
        active = (sep2 < jnp.asarray(r2, dtype)) & nonempty[:, None]
        if seed_bound is not None and os.environ.get(
            "LOAM_KNN_LIST_PRUNE", "1"
        ) != "0":
            # LIST-level pruning from the seed bounds: the in-kernel gate
            # visits chunk c for query i only when lb_i(c) <= min(kth_i,
            # bound_i) <= min(r2, bound_i); since lb_i >= sep2(tile, c), a
            # chunk with sep2 > max_i min(bound_i, r2) (max over the tile's
            # real queries; pad/masked slots contribute 0) would be skipped
            # by the gate for EVERY query — dropping it from the list is
            # exact and removes the per-visit gate evaluation itself, the
            # measured floor of the e2e regime where warm-start bounds
            # leave almost no chunk actually improving.
            qb = jnp.minimum(seed_bound.astype(dtype), jnp.asarray(r2, dtype))
            if query_mask is not None:
                qb = jnp.where(query_mask, qb, 0.0)
            qb = jnp.pad(qb, (0, qpad - Q))
            tile_bound = jnp.max(qb.reshape(n_tiles, tq), axis=1)
            active = active & (sep2 <= tile_bound[:, None])
        lst, cnt = _pack_active_lists(active, sep2)
    else:
        lst = jnp.zeros((n_tiles, n_chunks), jnp.int32)
        cnt = jnp.zeros((n_tiles, 1), jnp.int32)


    grid = (n_tiles,)
    n_out = 5 if with_coords else 2
    out_dtypes = [jnp.int32, jnp.float32] + [jnp.float32] * (n_out - 2)
    scratch = [
        pltpu.VMEM((k, tq), jnp.float32),
        pltpu.VMEM((k, tq), jnp.int32),
    ] + [pltpu.VMEM((k, tq), jnp.float32)] * (3 if with_coords else 0)
    # sub-block gate granularity: 1 measured fastest on v5e at every tested
    # scale (finer sub-gates DO shrink the processed columns, but each
    # gated region re-slices the chunk and pays cond + narrow-operand MXU
    # overhead that outweighs the saved elements: 1047/1158/1527 us for
    # sub=1/2/4 at 17k x 17k). LOAM_KNN_SUB overrides for future sweeps.
    n_sub = int(os.environ.get("LOAM_KNN_SUB", "0")) or 1
    in_specs = [
        pl.BlockSpec((3, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (2, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (6, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (n_tiles, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (n_tiles, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    operands = [qT, prep.tT, prep.rot, prep.rbox, cnt, lst]
    if seed_bound is not None:
        # pad value 0.0 closes the gate for pad slots outright (their
        # sentinel queries would skip anyway)
        bnd = jnp.pad(
            seed_bound.astype(dtype)[None], ((0, 0), (0, qpad - Q))
        )
        in_specs.append(
            pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        operands.append(bnd)
    out_specs = [
        pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(n_out)
    ]
    out_shape = [jax.ShapeDtypeStruct((k, qpad), dt) for dt in out_dtypes]
    if return_visits:
        out_specs.append(
            pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, qpad), jnp.int32))
    outs = pl.pallas_call(
        functools.partial(
            _knn_kernel, k=k, tt=tt, use_list=r2 > 0, with_coords=with_coords,
            init_v=r2 if r2 > 0 else float("inf"), n_sub=n_sub,
            with_bound=seed_bound is not None, count_visits=return_visits,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_INTERPRET,
    )(*operands)
    visits = None
    if return_visits:
        *outs, vc = outs
        visits = vc.reshape(n_tiles, tq)[:, 0]  # executed chunk_works/tile

    if with_coords:
        idx, d2, cx, cy, cz = outs
        d2q = d2[:, :Q]
        valid = jnp.isfinite(d2q)
        if max_dist > 0:
            # same rounding as the reference/XLA path: sqrt then strict <
            # (``kdtree.cpp:24-26``) — a squared compare can differ at ulps
            valid = valid & (jnp.sqrt(jnp.maximum(d2q, 0.0)) < max_dist)
        pk = PackedKnn(
            idx[0, :Q], valid, cx[:, :Q], cy[:, :Q], cz[:, :Q]
        )
        return (pk, visits) if return_visits else pk

    idx, d2 = outs
    idx = idx[:, :Q].T
    d2 = d2[:, :Q].T
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    valid = jnp.isfinite(d2)
    if max_dist > 0:
        valid = valid & (dist < max_dist)
    res = KnnResult(idx, jnp.where(valid, dist, jnp.inf), valid)
    return (res, visits) if return_visits else res


@functools.partial(jax.jit, static_argnames=("k", "max_dist", "tq", "tt"))
def knn_pallas(
    queries: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    k: int,
    max_dist: float = 0.0,
    tq: int = None,
    tt: int = None,
):
    """Drop-in equivalent of ``bruteforce.knn`` on TPU (f32).

    Returns a ``KnnResult``-compatible (indices, distances, mask) tuple (the
    caller wraps it; import cycle keeps the type in ``bruteforce``).
    ``tq``/``tt`` default to the measured per-scale optimum (``_auto_tiles``;
    ``LOAM_KNN_TQ``/``LOAM_KNN_TT`` override). Loop callers with fixed
    targets should split :func:`knn_prep` / :func:`knn_run` instead.
    """
    return knn_run(knn_prep(targets, target_mask, tt), queries, k, max_dist, tq)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_edge", "k_plane", "max_dist_edge", "max_dist_plane", "tq", "tt"
    ),
)
def knn_pallas_dual(
    q_edge: jax.Array,
    q_plane: jax.Array,
    t_edge: jax.Array,
    t_edge_mask: jax.Array,
    t_plane: jax.Array,
    t_plane_mask: jax.Array,
    k_edge: int,
    k_plane: int,
    max_dist_edge: float,
    max_dist_plane: float,
    tq: int = None,
    tt: int = None,
):
    """Both per-iteration searches of the ICF loop in ONE kernel launch.

    Edge queries search edge targets, planar queries search planar targets —
    the two calls the reference issues per iteration against its two KD-trees
    (``registration-inl.h:20-23``). Fusing them halves the per-iteration
    launch/prologue overhead and lets short edge tiles ride along with the
    large planar grid instead of paying their own launch.

    Class separation costs nothing extra: queries and targets are padded to
    tile/chunk multiples PER CLASS and concatenated (edges first), so every
    query tile and every target chunk is single-class, and the per-tile
    active chunk ranges (already computed for bbox culling) are simply
    intersected with the tile's class block. The kernel itself is unchanged.

    Both radius filters must be positive (they are the class-restriction
    mechanism's partner: a candidate from a wrong-class chunk can never
    appear because such chunks are outside every range). Returns
    ``(KnnResult_edges, KnnResult_planes)`` with (E, k_edge) / (P, k_plane)
    leaves, exactly equal to two separate ``knn_pallas`` calls.
    """
    prep = knn_dual_prep(t_edge, t_edge_mask, t_plane, t_plane_mask, tt=tt)
    return knn_dual_run(
        prep,
        q_edge,
        q_plane,
        k_edge,
        k_plane,
        max_dist_edge,
        max_dist_plane,
        tq=tq,
    )


class DualTargetPrep(NamedTuple):
    """Target-side state of :func:`knn_pallas_dual`, built once per target.

    The ICF loop's targets are fixed across outer iterations (the reference
    builds its two KD-trees once, ``registration-inl.h:20-23``); splitting
    prep from run keeps the padded/concatenated target block, its +inf
    invalidation row, and the per-chunk bounding boxes OUTSIDE the
    ``while_loop`` body — only the query-dependent work recurs.

    Int fields are Python ints (static shape metadata). The tuple must stay
    within one trace — don't pass it across a jit boundary (the ints would
    be treated as traced pytree leaves).
    """

    tT: jax.Array  # (3, mpad) padded concat targets, edges first (+3e37 invalid)
    rot: jax.Array  # (2, n_chunks) unit chunk-frame direction
    rbox: jax.Array  # (6, n_chunks) chunk box in its frame: u/v/z lo,hi
    n_edge: int  # Me: true edge target count
    mepad: int  # padded edge block length (planar indices offset)
    tt: int  # chunk length the boxes were built with


def knn_dual_prep(
    t_edge: jax.Array,
    t_edge_mask: jax.Array,
    t_plane: jax.Array,
    t_plane_mask: jax.Array,
    tt: int = None,
) -> DualTargetPrep:
    """Build the loop-invariant target state for :func:`knn_dual_run`."""
    dtype = jnp.float32
    Me, Mp = t_edge.shape[0], t_plane.shape[0]
    tt = tt or int(_TT or _auto_tiles(Me + Mp)[1])
    mepad = max(-(-Me // tt) * tt, tt)
    mppad = max(-(-Mp // tt) * tt, tt)
    mpad = mepad + mppad

    # prep is pad+concat only (static-shape pads fuse; no update-slices);
    # invalid slots carry +3e37 sentinel coordinates (see knn_prep)
    big = jnp.asarray(3e37, dtype)
    te = jnp.where(t_edge_mask[:, None], t_edge.astype(dtype), big)
    tp = jnp.where(t_plane_mask[:, None], t_plane.astype(dtype), big)
    tT = _padcat(te.T, tp.T, mepad, mppad, fill=3e37)
    n_chunks = mpad // tt
    tvalid = _padcat(
        t_edge_mask[None], t_plane_mask[None], mepad, mppad, fill=False
    )[0]
    tch = tT.reshape(3, n_chunks, tt)
    vch = tvalid.reshape(n_chunks, tt)[None]
    rot, rbox = _chunk_frames(tch, vch)
    return DualTargetPrep(tT, rot, rbox, Me, mepad, tt)


def _padcat(a, b, na, nb, fill=0.0):
    return jnp.concatenate(
        [
            jnp.pad(a, ((0, 0), (0, na - a.shape[1])), constant_values=fill),
            jnp.pad(b, ((0, 0), (0, nb - b.shape[1])), constant_values=fill),
        ],
        axis=1,
    )


def knn_dual_run(
    prep: DualTargetPrep,
    q_edge: jax.Array,
    q_plane: jax.Array,
    k_edge: int,
    k_plane: int,
    max_dist_edge: float,
    max_dist_plane: float,
    tq: int = None,
):
    """Query-side half of :func:`knn_pallas_dual` (see its docstring)."""
    from ..neighbors.bruteforce import KnnResult

    assert max_dist_edge > 0 and max_dist_plane > 0
    k = max(k_edge, k_plane)
    dtype = jnp.float32
    E, P = q_edge.shape[0], q_plane.shape[0]
    tq = tq or int(_TQ or _auto_tiles(prep.tT.shape[1])[0])
    epad = -(-E // tq) * tq
    ppad = -(-P // tq) * tq
    qpad = epad + ppad
    tt = prep.tt
    mepad = prep.mepad
    mpad = prep.tT.shape[1]
    tT, rot, rbox = prep.tT, prep.rot, prep.rbox

    qT = _padcat(q_edge.astype(dtype).T, q_plane.astype(dtype).T, epad, ppad)

    n_chunks = mpad // tt
    n_tiles = qpad // tq
    ne_chunks = mepad // tt
    ne_tiles = epad // tq
    big = jnp.asarray(3e37, dtype)
    ar = jnp.arange(qpad)
    qvalid = (ar < E) | ((ar >= epad) & (ar < epad + P))
    qch = qT.reshape(3, n_tiles, tq)
    qvch = qvalid.reshape(1, n_tiles, tq)
    qlo = jnp.min(jnp.where(qvch, qch, big), axis=2)
    qhi = jnp.max(jnp.where(qvch, qch, -big), axis=2)

    # Per-tile active chunk list: rotated-frame box separation vs the TILE's
    # class radius, intersected with the tile's class block. Every chunk in
    # a resulting list is same-class, so the kernel needs no class logic.
    sep2, nonempty = _tile_gaps(qlo, qhi, rot, rbox)
    tile_is_edge = jnp.arange(n_tiles) < ne_tiles
    chunk_is_edge = jnp.arange(n_chunks) < ne_chunks
    r2_tile = jnp.where(
        tile_is_edge,
        jnp.asarray(float(max_dist_edge) ** 2, dtype),
        jnp.asarray(float(max_dist_plane) ** 2, dtype),
    )
    active = (
        (sep2 < r2_tile[:, None])
        & nonempty[:, None]
        & (tile_is_edge[:, None] == chunk_is_edge[None, :])
    )
    lst, cnt = _pack_active_lists(active, sep2)

    idx, d2 = pl.pallas_call(
        functools.partial(
            _knn_kernel, k=k, tt=tt, use_list=True,
            # one static init for both classes: the larger radius bound is
            # correct for each (candidates below a class's own r^2 always
            # enter; dead slots >= class r^2 are filtered in unpack())
            init_v=max(float(max_dist_edge) ** 2, float(max_dist_plane) ** 2),
            n_sub=int(os.environ.get("LOAM_KNN_SUB", "0")) or 1,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (6, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (n_tiles, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (n_tiles, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, qpad), jnp.int32),
            jax.ShapeDtypeStruct((k, qpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, tq), jnp.float32),
            pltpu.VMEM((k, tq), jnp.int32),
        ],
        interpret=_INTERPRET,
    )(qT, tT, rot, rbox, cnt, lst)

    def unpack(off, n, kc, max_dist, idx_off):
        i = idx[:kc, off : off + n].T  # (n, kc) ascending => first kc nearest
        v = d2[:kc, off : off + n].T
        dist = jnp.sqrt(jnp.maximum(v, 0.0))
        valid = jnp.isfinite(v) & (dist < max_dist)
        i = jnp.where(valid, i - idx_off, 0)
        return KnnResult(i, jnp.where(valid, dist, jnp.inf), valid)

    return (
        unpack(0, E, k_edge, max_dist_edge, 0),
        unpack(epad, P, k_plane, max_dist_plane, mepad),
    )
