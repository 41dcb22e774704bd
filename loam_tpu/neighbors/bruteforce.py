"""Exact brute-force kNN on the MXU.

The (Q, M) squared-distance matrix decomposes as ``|q|^2 + |t|^2 - 2 q.t``
whose cross term is a (Q,3)x(3,M) matmul — ideal MXU work. ``lax.top_k`` then
selects the k nearest per query. Queries are processed in fixed-size tiles via
``lax.map`` so the distance matrix never exceeds ``tile x M`` in HBM/VMEM.

Replicates reference kNN semantics exactly (``kdtree.cpp:10-28``): results are
the k nearest targets, distance-ascending, with entries beyond ``max_dist``
masked out (post-hoc radius filter, strict ``<`` comparison). Invalid
(padded) targets never appear in results.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class KnnResult(NamedTuple):
    """k-nearest-neighbor search output (a pytree; leading dims batch).

    Attributes:
      indices: (..., Q, k) int32 target indices, distance-ascending. Entries
        where ``mask`` is False are arbitrary in-bounds values.
      distances: (..., Q, k) Euclidean distances (inf where invalid).
      mask: (..., Q, k) bool — True where a real neighbor within the radius
        (and within the valid target set) fills the slot.
    """

    indices: jax.Array
    distances: jax.Array
    mask: jax.Array


def _tile_knn(
    q_tile: jax.Array,
    targets: jax.Array,
    t_sq_masked: jax.Array,
    k: int,
    max_dist: float,
) -> KnnResult:
    """kNN of one query tile against all targets. ``t_sq_masked`` carries +inf
    in invalid target slots so they sort last and are masked out."""
    # d^2 = |q|^2 + |t|^2 - 2 q.t   (cross term on the MXU)
    cross = q_tile @ targets.T  # (C, M)
    d2 = jnp.sum(q_tile * q_tile, axis=-1)[:, None] + t_sq_masked[None, :] - 2.0 * cross
    M = targets.shape[0]
    kk = min(k, M)  # fewer targets than k: result holds fewer entries (§2.3(7))
    neg_d2, idx = lax.top_k(-d2, kk)  # ascending distance
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        neg_d2 = jnp.pad(neg_d2, pad, constant_values=-jnp.inf)
        idx = jnp.pad(idx, pad)
    d2k = -neg_d2
    dist = jnp.sqrt(jnp.maximum(d2k, 0.0))
    valid = jnp.isfinite(d2k)
    if max_dist > 0:
        valid = valid & (dist < max_dist)
    return KnnResult(idx.astype(jnp.int32), jnp.where(valid, dist, jnp.inf), valid)


@functools.partial(jax.jit, static_argnames=("k", "max_dist", "tile"))
def knn(
    queries: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    k: int,
    max_dist: float = 0.0,
    tile: int = 2048,
) -> KnnResult:
    """Exact k-nearest-neighbor search with reference radius semantics.

    Args:
      queries: (Q, 3) query points (invalid queries simply yield ignorable
        rows; callers carry their own query mask).
      targets: (M, 3) target points, padded.
      target_mask: (M,) validity of target slots.
      k: neighbors per query (static).
      max_dist: radius filter — neighbors at distance >= max_dist are masked
        (strict ``<`` per ``kdtree.cpp:24-26``). <= 0 disables the filter.
      tile: query tile size (static); queries are padded to a multiple.

    Returns: KnnResult with (Q, k) leaves.
    """
    Q = queries.shape[0]
    dtype = queries.dtype
    t_sq = jnp.sum(targets * targets, axis=-1)
    t_sq_masked = jnp.where(target_mask, t_sq, jnp.asarray(jnp.inf, dtype))

    if Q <= tile:
        return _tile_knn(queries, targets, t_sq_masked, k, max_dist)

    n_tiles = -(-Q // tile)
    padded = jnp.zeros((n_tiles * tile, 3), dtype).at[:Q].set(queries)
    res = lax.map(
        lambda qt: _tile_knn(qt, targets, t_sq_masked, k, max_dist),
        padded.reshape(n_tiles, tile, 3),
    )
    return KnnResult(
        res.indices.reshape(n_tiles * tile, k)[:Q],
        res.distances.reshape(n_tiles * tile, k)[:Q],
        res.mask.reshape(n_tiles * tile, k)[:Q],
    )


def knn_oracle(
    queries: np.ndarray,
    targets: np.ndarray,
    target_mask: np.ndarray,
    k: int,
    max_dist: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NumPy reference oracle replicating ``kdtree_internal::knnSearch``
    (``kdtree.cpp:10-28``): k nearest by full sort, then strict radius filter.
    Returns (indices, distances, mask) shaped (Q, k)."""
    tgt = np.asarray(targets)[np.asarray(target_mask)]
    orig_idx = np.flatnonzero(np.asarray(target_mask))
    Q = queries.shape[0]
    idx = np.zeros((Q, k), dtype=np.int32)
    dist = np.full((Q, k), np.inf)
    mask = np.zeros((Q, k), dtype=bool)
    for i in range(Q):
        d = np.linalg.norm(tgt - queries[i], axis=-1)
        order = np.argsort(d, kind="stable")[:k]
        m = len(order)
        sel = d[order]
        keep = np.ones(m, dtype=bool) if max_dist <= 0 else sel < max_dist
        idx[i, :m] = orig_idx[order]
        dist[i, :m] = np.where(keep, sel, np.inf)
        mask[i, :m] = keep
    return idx, dist, mask
