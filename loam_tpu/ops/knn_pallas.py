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


def _pack_active_lists(active: jax.Array):
    """Left-pack active chunk indices: (T, C) bool -> ((T, C) int32 lists,
    (T, 1) counts), ascending chunk order.

    A stable argsort of the inactive flags gives the same result, but
    ``lax.sort`` is a fixed-cost unfused op on TPU (~1 ms standalone); the
    cumsum + one-hot reduce here is pure elementwise+reduction work that XLA
    fuses. ``dest[t, j]`` = output slot of chunk j (cumsum is monotone, so
    lists stay ascending — preserving global first-index tie-breaking);
    inverting via ``lst[t, i] = sum_j [dest[t, j] == i] * j`` never
    materializes the (T, C, C) one-hot.
    """
    n_chunks = active.shape[1]
    dest = jnp.cumsum(active, axis=1, dtype=jnp.int32) - 1
    dest = jnp.where(active, dest, -1)  # (T, C)
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
    q_ref, t_ref, tinv_ref, cnt_ref, lst_ref, idx_ref, d2_ref, *coord_refs,
    k: int, tt: int, use_list: bool, with_coords: bool = False,
):
    q = q_ref[...]  # (3, TQ)
    tq = q.shape[1]
    m_total = t_ref.shape[1]
    # hoisted: program_id inside a lax.cond/fori_loop closure stages the
    # primitive into the branch jaxpr, which interpret mode can't evaluate
    tile = pl.program_id(0)
    row = lax.broadcasted_iota(jnp.int32, (tt, tq), 0)
    row2k = lax.broadcasted_iota(jnp.int32, (2 * k, tq), 0)
    qx = q[0][None, :]
    qy = q[1][None, :]
    qz = q[2][None, :]

    def chunk_work(c, state):
        if with_coords:
            best_v, best_i, best_c = state
        else:
            best_v, best_i = state
            best_c = None
        off = c * tt
        t = t_ref[:, pl.ds(off, tt)]  # (3, TT)
        tinv = tinv_ref[0, pl.ds(off, tt)]  # (TT,) +inf at invalid slots
        dx = t[0][:, None] - qx
        dy = t[1][:, None] - qy
        dz = t[2][:, None] - qz
        d2 = dx * dx + dy * dy + dz * dz + tinv[:, None]  # (TT, TQ)
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
        # merge running + chunk candidates (running first: lower indices win
        # distance ties, preserving global first-index tie-breaking)
        mv = jnp.concatenate([best_v, cv], axis=0)  # (2k, TQ)
        mi = jnp.concatenate([best_i, ci], axis=0)
        if with_coords:
            mc = [
                jnp.concatenate([best_c[a], jnp.stack(ccs[a], axis=0)], axis=0)
                for a in range(3)
            ]
        nv, ni = [], []
        nc = ([], [], [])
        for _ in range(k):
            m = jnp.min(mv, axis=0)
            am = jnp.argmin(mv, axis=0).astype(jnp.int32)
            sel = row2k == am[None, :]
            nv.append(m)
            ni.append(jnp.sum(jnp.where(sel, mi, 0), axis=0, dtype=jnp.int32))
            if with_coords:
                for a in range(3):
                    nc[a].append(jnp.sum(jnp.where(sel, mc[a], 0.0), axis=0))
            mv = jnp.where(sel, jnp.inf, mv)
        nv = jnp.stack(nv, axis=0)
        ni = jnp.stack(ni, axis=0)
        if with_coords:
            return nv, ni, tuple(jnp.stack(nc[a], axis=0) for a in range(3))
        return nv, ni

    best_v = jnp.full((k, tq), jnp.inf, jnp.float32)
    best_i = jnp.zeros((k, tq), jnp.int32)
    state0 = (best_v, best_i)
    if with_coords:
        state0 = state0 + (
            tuple(jnp.zeros((k, tq), jnp.float32) for _ in range(3)),
        )
    if use_list:
        # Iterate EXACTLY this tile's active chunks, from the per-tile list
        # precomputed at the jit level (chunks whose bounding box lies
        # entirely beyond the radius filter are absent — their candidates
        # would be masked out anyway, strict < max_dist). Lists are
        # ascending, preserving global first-index tie-breaking. Compared
        # with the earlier contiguous [start, end) range + in-kernel bbox
        # cond, lists need no spatial-ordering alignment between query
        # tiles and target chunks and spend zero in-kernel work on culling.
        def chunk(j, state):
            return chunk_work(lst_ref[tile, j], state)

        out = lax.fori_loop(0, cnt_ref[tile, 0], chunk, state0)
    else:
        out = lax.fori_loop(0, m_total // tt, chunk_work, state0)
    idx_ref[...] = out[1]
    d2_ref[...] = out[0]
    if with_coords:
        for a in range(3):
            coord_refs[a][...] = out[2][a]


class TargetPrep(NamedTuple):
    """Loop-invariant target-side state of :func:`knn_run`.

    The ICF loop searches FIXED targets with moving queries (the reference
    builds its KD-trees once, ``registration-inl.h:20-23``); building this
    once above the loop keeps the target pad/transpose/bounding-box work —
    a measurable slice of per-call time at feature scale — out of every
    iteration. Int fields are static shape metadata: keep the tuple inside
    one trace (do not pass across a jit boundary).
    """

    tT: jax.Array  # (3, mpad) padded transposed targets
    tinv: jax.Array  # (1, mpad) additive +inf invalidation
    blo: jax.Array  # (3, n_chunks) per-chunk bbox lows
    bhi: jax.Array  # (3, n_chunks)
    m: int  # true target count
    tt: int  # chunk length


def knn_prep(
    targets: jax.Array, target_mask: jax.Array, tt: int = None
) -> TargetPrep:
    """Build the target-side state for :func:`knn_run` (pad + transpose +
    per-chunk bounding boxes; static-shape pads, no update-slices)."""
    dtype = jnp.float32
    M = targets.shape[0]
    tt = tt or int(_TT or _auto_tiles(M)[1])
    mpad = max(-(-M // tt) * tt, tt)
    tT = jnp.pad(targets.astype(dtype).T, ((0, 0), (0, mpad - M)))
    inf = jnp.asarray(jnp.inf, dtype)
    tinv = jnp.pad(
        jnp.where(target_mask, 0.0, inf)[None],
        ((0, 0), (0, mpad - M)),
        constant_values=jnp.inf,
    )
    n_chunks = mpad // tt
    big = jnp.asarray(3e37, dtype)
    tvalid = jnp.isfinite(tinv[0])
    tch = tT.reshape(3, n_chunks, tt)
    vch = tvalid.reshape(n_chunks, tt)[None]
    blo = jnp.min(jnp.where(vch, tch, big), axis=2)  # (3, n_chunks)
    bhi = jnp.max(jnp.where(vch, tch, -big), axis=2)
    return TargetPrep(tT, tinv, blo, bhi, M, tt)


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


def knn_run(
    prep: TargetPrep,
    queries: jax.Array,
    k: int,
    max_dist: float = 0.0,
    tq: int = None,
    with_coords: bool = False,
):
    """Query-side half of :func:`knn_pallas` against prebuilt targets.

    ``with_coords=True`` returns a :class:`PackedKnn` (kernel-layout result
    with neighbor coordinates) instead of a ``KnnResult``.
    """
    from ..neighbors.bruteforce import KnnResult

    Q = queries.shape[0]
    tt = prep.tt
    mpad = prep.tT.shape[1]
    tq = tq or int(_TQ or _auto_tiles(mpad)[0])
    dtype = jnp.float32
    qpad = -(-Q // tq) * tq
    qT = jnp.pad(queries.astype(dtype).T, ((0, 0), (0, qpad - Q)))

    n_chunks = mpad // tt
    n_tiles = qpad // tq
    big = jnp.asarray(3e37, dtype)
    qch = qT.reshape(3, n_tiles, tq)
    qvalid = (
        jnp.arange(qpad) < Q
    ).reshape(1, n_tiles, tq)
    qlo = jnp.min(jnp.where(qvalid, qch, big), axis=2)  # (3, n_tiles)
    qhi = jnp.max(jnp.where(qvalid, qch, -big), axis=2)

    # Per-tile ACTIVE CHUNK LIST: the exact set of chunks whose bounding box
    # is within the radius of the tile's query box (anything else cannot
    # contribute a match under the strict < max_dist filter). Packed left in
    # ascending chunk order via a stable argsort of the inactive flags —
    # ascending order preserves global first-index tie-breaking.
    r2 = float(max_dist) ** 2 if max_dist > 0 else 0.0
    if r2 > 0:
        gap = jnp.maximum(
            jnp.maximum(
                qlo.T[:, None, :] - prep.bhi.T[None, :, :],
                prep.blo.T[None, :, :] - qhi.T[:, None, :],
            ),
            0.0,
        )  # (n_tiles, n_chunks, 3)
        sep2 = jnp.sum(gap * gap, axis=-1)
        active = sep2 < jnp.asarray(r2, dtype)  # (n_tiles, n_chunks)
        lst, cnt = _pack_active_lists(active)
    else:
        lst = jnp.zeros((n_tiles, n_chunks), jnp.int32)
        cnt = jnp.zeros((n_tiles, 1), jnp.int32)

    grid = (n_tiles,)
    n_out = 5 if with_coords else 2
    out_dtypes = [jnp.int32, jnp.float32] + [jnp.float32] * (n_out - 2)
    outs = pl.pallas_call(
        functools.partial(
            _knn_kernel, k=k, tt=tt, use_list=r2 > 0, with_coords=with_coords
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_tiles, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (n_tiles, n_chunks), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, qpad), dt) for dt in out_dtypes
        ],
        interpret=_INTERPRET,
    )(qT, prep.tT, prep.tinv, cnt, lst)

    if with_coords:
        idx, d2, cx, cy, cz = outs
        d2q = d2[:, :Q]
        valid = jnp.isfinite(d2q)
        if max_dist > 0:
            # same rounding as the reference/XLA path: sqrt then strict <
            # (``kdtree.cpp:24-26``) — a squared compare can differ at ulps
            valid = valid & (jnp.sqrt(jnp.maximum(d2q, 0.0)) < max_dist)
        return PackedKnn(
            idx[0, :Q], valid, cx[:, :Q], cy[:, :Q], cz[:, :Q]
        )

    idx, d2 = outs
    idx = idx[:, :Q].T
    d2 = d2[:, :Q].T
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    valid = jnp.isfinite(d2)
    if max_dist > 0:
        valid = valid & (dist < max_dist)
    return KnnResult(idx, jnp.where(valid, dist, jnp.inf), valid)


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

    tT: jax.Array  # (3, mpad) padded concat targets, edges first
    tinv: jax.Array  # (1, mpad) additive +inf invalidation
    blo: jax.Array  # (3, n_chunks) per-chunk bbox lows
    bhi: jax.Array  # (3, n_chunks)
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

    # prep is pad+concat only (static-shape pads fuse; no update-slices)
    tT = _padcat(t_edge.astype(dtype).T, t_plane.astype(dtype).T, mepad, mppad)
    inf = jnp.asarray(jnp.inf, dtype)
    tinv = _padcat(
        jnp.where(t_edge_mask, 0.0, inf)[None],
        jnp.where(t_plane_mask, 0.0, inf)[None],
        mepad,
        mppad,
        fill=jnp.inf,
    )

    n_chunks = mpad // tt
    big = jnp.asarray(3e37, dtype)
    tvalid = jnp.isfinite(tinv[0])
    tch = tT.reshape(3, n_chunks, tt)
    vch = tvalid.reshape(n_chunks, tt)[None]
    blo = jnp.min(jnp.where(vch, tch, big), axis=2)
    bhi = jnp.max(jnp.where(vch, tch, -big), axis=2)
    return DualTargetPrep(tT, tinv, blo, bhi, Me, mepad, tt)


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
    tT, tinv, blo, bhi = prep.tT, prep.tinv, prep.blo, prep.bhi

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

    # Per-tile active chunk list: bbox separation vs the TILE's class
    # radius, intersected with the tile's class block. Every chunk in a
    # resulting list is same-class, so the kernel needs no class logic.
    gap = jnp.maximum(
        jnp.maximum(
            qlo.T[:, None, :] - bhi.T[None, :, :],
            blo.T[None, :, :] - qhi.T[:, None, :],
        ),
        0.0,
    )  # (n_tiles, n_chunks, 3)
    sep2 = jnp.sum(gap * gap, axis=-1)
    tile_is_edge = jnp.arange(n_tiles) < ne_tiles
    chunk_is_edge = jnp.arange(n_chunks) < ne_chunks
    r2_tile = jnp.where(
        tile_is_edge,
        jnp.asarray(float(max_dist_edge) ** 2, dtype),
        jnp.asarray(float(max_dist_plane) ** 2, dtype),
    )
    active = (sep2 < r2_tile[:, None]) & (
        tile_is_edge[:, None] == chunk_is_edge[None, :]
    )
    lst, cnt = _pack_active_lists(active)

    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tt=tt, use_list=True),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        interpret=_INTERPRET,
    )(qT, tT, tinv, cnt, lst)

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
