"""Fused brute-force kNN Pallas kernel.

Replaces the XLA path's HBM-materialized (Q, M) distance matrix + k argmin
re-reads (~15 GB of HBM traffic for 19.5k x 19.5k) with a single kernel that
keeps everything in VMEM: per query tile, loop over target chunks — the VPU
computes (TQ, TT) squared distances by direct coordinate differences (exact
f32; the MXU cross-term form is 2%-utilized at K=3 and numerically worse)
and maintains a running top-k per query. HBM traffic drops to reading
queries/targets once per tile.

Semantics identical to ``bruteforce.knn``/``topk_min``: ascending distance,
first-index tie-breaking (within a chunk argmin takes the first minimum;
across chunks the merge prefers the running list, which holds lower target
indices), invalid targets (additive +inf mask) never selected.
"""

from __future__ import annotations

import functools
from typing import Tuple

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


def _extract_k(d2, col, k):
    """k smallest of d2 (TQ, W) -> ((TQ, k) values, (TQ, k) cols), ascending,
    first-index ties. Unrolled min/argmin passes (VPU)."""
    vs, cs = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=1)
        am = jnp.argmin(d2, axis=1).astype(jnp.int32)
        vs.append(m)
        cs.append(am)
        d2 = jnp.where(col == am[:, None], jnp.inf, d2)
    return jnp.stack(vs, axis=1), jnp.stack(cs, axis=1)


def _knn_kernel(q_ref, t_ref, tinv_ref, idx_ref, d2_ref, *, k: int, tt: int):
    q = q_ref[...]  # (3, TQ)
    tq = q.shape[1]
    m_total = t_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
    col2k = lax.broadcasted_iota(jnp.int32, (tq, 2 * k), 1)

    def chunk(c, state):
        best_v, best_i = state
        off = c * tt
        t = t_ref[:, pl.ds(off, tt)]  # (3, TT)
        tinv = tinv_ref[0, pl.ds(off, tt)]  # (TT,) +inf at invalid slots
        # Direct squared differences on the VPU: exact f32 (the
        # |q|^2+|t|^2-2qt MXU form suffers bf16 inputs / cancellation, and
        # at K=3 the MXU is 2% utilized — no speed advantage to recover).
        dx = t[0][None, :] - q[0][:, None]
        dy = t[1][None, :] - q[1][:, None]
        dz = t[2][None, :] - q[2][:, None]
        d2 = dx * dx + dy * dy + dz * dz + tinv[None, :]
        cv, cc = _extract_k(d2, col, k)
        ci = cc + off
        # merge running + chunk candidates (running first: lower indices win
        # distance ties, preserving global first-index tie-breaking)
        mv = jnp.concatenate([best_v, cv], axis=1)  # (TQ, 2k)
        mi = jnp.concatenate([best_i, ci], axis=1)
        nv, nc = [], []
        for _ in range(k):
            m = jnp.min(mv, axis=1)
            am = jnp.argmin(mv, axis=1).astype(jnp.int32)
            sel = col2k == am[:, None]
            nv.append(m)
            nc.append(jnp.sum(jnp.where(sel, mi, 0), axis=1))
            mv = jnp.where(sel, jnp.inf, mv)
        return jnp.stack(nv, axis=1), jnp.stack(nc, axis=1)

    best_v = jnp.full((tq, k), jnp.inf, jnp.float32)
    best_i = jnp.zeros((tq, k), jnp.int32)
    best_v, best_i = lax.fori_loop(0, m_total // tt, chunk, (best_v, best_i))
    idx_ref[...] = best_i
    d2_ref[...] = best_v


@functools.partial(jax.jit, static_argnames=("k", "max_dist", "tq", "tt"))
def knn_pallas(
    queries: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    k: int,
    max_dist: float = 0.0,
    tq: int = 256,
    tt: int = 512,
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

    grid = (qpad // tq,)
    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tt=tt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qpad, k), jnp.int32),
            jax.ShapeDtypeStruct((qpad, k), jnp.float32),
        ],
    )(qT, tT, tinv)

    idx = idx[:Q]
    d2 = d2[:Q]
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    valid = jnp.isfinite(d2)
    if max_dist > 0:
        valid = valid & (dist < max_dist)
    return KnnResult(idx, jnp.where(valid, dist, jnp.inf), valid)
