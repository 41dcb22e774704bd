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
    q_ref, t_ref, tinv_ref, bbox_ref, qbox_ref, rng_ref, idx_ref, d2_ref, *,
    k: int, tt: int, r2_skip: float,
):
    q = q_ref[...]  # (3, TQ)
    tq = q.shape[1]
    m_total = t_ref.shape[1]
    row = lax.broadcasted_iota(jnp.int32, (tt, tq), 0)
    row2k = lax.broadcasted_iota(jnp.int32, (2 * k, tq), 0)
    qx = q[0][None, :]
    qy = q[1][None, :]
    qz = q[2][None, :]

    def chunk_work(c, state):
        best_v, best_i = state
        off = c * tt
        t = t_ref[:, pl.ds(off, tt)]  # (3, TT)
        tinv = tinv_ref[0, pl.ds(off, tt)]  # (TT,) +inf at invalid slots
        dx = t[0][:, None] - qx
        dy = t[1][:, None] - qy
        dz = t[2][:, None] - qz
        d2 = dx * dx + dy * dy + dz * dz + tinv[:, None]  # (TT, TQ)
        cv, cr = _extract_k_rows(d2, row, k)
        ci = cr + off
        # merge running + chunk candidates (running first: lower indices win
        # distance ties, preserving global first-index tie-breaking)
        mv = jnp.concatenate([best_v, cv], axis=0)  # (2k, TQ)
        mi = jnp.concatenate([best_i, ci], axis=0)
        nv, ni = [], []
        for _ in range(k):
            m = jnp.min(mv, axis=0)
            am = jnp.argmin(mv, axis=0).astype(jnp.int32)
            sel = row2k == am[None, :]
            nv.append(m)
            ni.append(jnp.sum(jnp.where(sel, mi, 0), axis=0))
            mv = jnp.where(sel, jnp.inf, mv)
        return jnp.stack(nv, axis=0), jnp.stack(ni, axis=0)

    if r2_skip > 0:

        def chunk(c, state):
            # Exact chunk culling: scan-ordered targets are spatially
            # coherent, so most chunks' bounding boxes lie entirely beyond
            # the radius filter — their entries would be masked out anyway
            # (strict < max_dist), so skipping them changes nothing. All
            # bbox math is SMEM scalar arithmetic.
            tile = pl.program_id(0)
            sep2 = jnp.float32(0.0)
            for a in range(3):
                qlo = qbox_ref[tile, a]
                qhi = qbox_ref[tile, 3 + a]
                blo = bbox_ref[0, 6 * c + a]
                bhi = bbox_ref[0, 6 * c + 3 + a]
                g = jnp.maximum(jnp.maximum(qlo - bhi, blo - qhi), 0.0)
                sep2 = sep2 + g * g
            return lax.cond(sep2 < r2_skip, chunk_work, lambda _, s: s, c, state)

    else:
        chunk = chunk_work

    best_v = jnp.full((k, tq), jnp.inf, jnp.float32)
    best_i = jnp.zeros((k, tq), jnp.int32)
    if r2_skip > 0:
        # loop only over this tile's active chunk RANGE (precomputed at the
        # jit level from the same bbox test): azimuth/spatially sorted
        # targets make active chunks near-contiguous, so the per-chunk cond
        # overhead of the full 0..n_chunks sweep (the dominant cost for
        # narrow wedges) collapses to the few chunks that can matter.
        tile = pl.program_id(0)
        start = rng_ref[tile, 0]
        end = rng_ref[tile, 1]
        best_v, best_i = lax.fori_loop(start, end, chunk, (best_v, best_i))
    else:
        best_v, best_i = lax.fori_loop(
            0, m_total // tt, chunk, (best_v, best_i)
        )
    idx_ref[...] = best_i
    d2_ref[...] = best_v


@functools.partial(jax.jit, static_argnames=("k", "max_dist", "tq", "tt"))
def knn_pallas(
    queries: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    k: int,
    max_dist: float = 0.0,
    tq: int = 512,
    tt: int = 1024,
):
    """Drop-in equivalent of ``bruteforce.knn`` on TPU (f32).

    Returns a ``KnnResult``-compatible (indices, distances, mask) tuple (the
    caller wraps it; import cycle keeps the type in ``bruteforce``).
    """
    from ..neighbors.bruteforce import KnnResult

    Q = queries.shape[0]
    M = targets.shape[0]
    dtype = jnp.float32
    qpad = -(-Q // tq) * tq
    mpad = max(-(-M // tt) * tt, tt)

    qT = jnp.zeros((3, qpad), dtype).at[:, :Q].set(queries.astype(dtype).T)
    tT = jnp.zeros((3, mpad), dtype).at[:, :M].set(targets.astype(dtype).T)
    # additive invalidation mask: +inf for padded / masked-out target slots
    tinv = jnp.full((1, mpad), jnp.inf, dtype)
    tinv = tinv.at[0, :M].set(jnp.where(target_mask, 0.0, jnp.inf))

    # per-chunk target bounding boxes + per-tile query bounding boxes for
    # exact radius culling (layout: [lo_x, lo_y, lo_z, hi_x, hi_y, hi_z])
    n_chunks = mpad // tt
    n_tiles = qpad // tq
    big = jnp.asarray(3e37, dtype)
    tvalid = jnp.zeros((mpad,), bool).at[:M].set(target_mask)
    tch = tT.reshape(3, n_chunks, tt)
    vch = tvalid.reshape(n_chunks, tt)[None]
    blo = jnp.min(jnp.where(vch, tch, big), axis=2)  # (3, n_chunks)
    bhi = jnp.max(jnp.where(vch, tch, -big), axis=2)
    bbox = jnp.concatenate([blo, bhi], axis=0)  # (6, n_chunks)
    bbox = bbox.T.reshape(1, n_chunks * 6)
    qch = qT.reshape(3, n_tiles, tq)
    qvalid = jnp.zeros((qpad,), bool).at[:Q].set(True).reshape(1, n_tiles, tq)
    qlo = jnp.min(jnp.where(qvalid, qch, big), axis=2)  # (3, n_tiles)
    qhi = jnp.max(jnp.where(qvalid, qch, -big), axis=2)
    qbox = jnp.concatenate([qlo, qhi], axis=0).T  # (n_tiles, 6)

    # Per-tile active chunk range [start, end): the same separation test the
    # kernel applies per chunk, vectorized here over (tiles, chunks). Sorted
    # input order makes the active set near-contiguous; the covering range
    # may include a few inactive interior chunks (e.g. at the +-pi azimuth
    # wrap), which the kernel's per-chunk cond still skips cheaply.
    r2 = float(max_dist) ** 2 if max_dist > 0 else 0.0
    if r2 > 0:
        gap = jnp.maximum(
            jnp.maximum(
                qlo.T[:, None, :] - bhi.T[None, :, :],
                blo.T[None, :, :] - qhi.T[:, None, :],
            ),
            0.0,
        )  # (n_tiles, n_chunks, 3)
        sep2 = jnp.sum(gap * gap, axis=-1)
        active = sep2 < jnp.asarray(r2, dtype)  # (n_tiles, n_chunks)
        has = jnp.any(active, axis=1)
        first = jnp.argmax(active, axis=1).astype(jnp.int32)
        last = (
            n_chunks - 1 - jnp.argmax(active[:, ::-1], axis=1).astype(jnp.int32)
        )
        start = jnp.where(has, first, 0)
        end = jnp.where(has, last + 1, 0)
        ranges = jnp.stack([start, end], axis=1)  # (n_tiles, 2) int32
    else:
        ranges = jnp.zeros((n_tiles, 2), jnp.int32)

    grid = (n_tiles,)
    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tt=tt, r2_skip=r2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n_chunks * 6), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (n_tiles, 6), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (n_tiles, 2), lambda i: (0, 0), memory_space=pltpu.SMEM
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
    )(qT, tT, tinv, bbox, qbox, ranges)

    idx = idx[:, :Q].T
    d2 = d2[:, :Q].T
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    valid = jnp.isfinite(d2)
    if max_dist > 0:
        valid = valid & (dist < max_dist)
    return KnnResult(idx, jnp.where(valid, dist, jnp.inf), valid)
