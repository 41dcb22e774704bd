"""Vectorized curvature + point-validity kernels.

TPU-first reformulation of the reference's per-point scalar loops:

  * Curvature (``features-inl.h:53-87``): the per-point neighbor accumulation
    ``d_i = sum_{n=1..N}(p_{i-n} + p_{i+n}) - 2N p_i``, ``c_i = |d_i|^2`` is a
    1-D stencil along each scan line — computed here as a sum of 2N static
    shifted slices over the whole (L, P, 3) scan at once (XLA fuses these into
    a single elementwise pass).

  * Validity (``features-inl.h:90-124``, ``features.cpp:18-70``): although the
    reference mutates the mask imperatively point by point, every check's
    *firing condition* is a pure function of the per-point ranges, and the
    mask is monotone (only ever cleared). The whole mask is therefore the
    complement of an OR of dilated firing masks — fully data-parallel:

      check1 (line edge):   fires on j < N or j >= P-N;          clears self
      check2 (range gate):  fires on ~c1 & out-of-range;          clears j-N..j+N
      check3a (occlusion 1): fires on ~c1 & ~c2 & (r[j+1]-r[j]>T); clears j+1..j+N
      check3b (occlusion 2): fires on ~c1 & ~c2 & (r[j]-r[j+1]>T); clears j-N+1..j
      check4 (parallel):    fires on ~c1 & ~c2 & ~c3 & cond;       clears self

    The ``continue`` statements in the reference only gate which *later*
    checks may fire for the same point — captured by the ``~cK`` terms.
    All dilations stay within a scan line by construction (proof: a firing
    point has j in [N, P-N-1], so its widest clear window j±N stays in
    [0, P-1]); shifts here zero-fill rather than wrap, so lines never leak
    into each other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import FeatureExtractionParams, LidarParams


def validate_scan(scan: jax.Array, lidar: LidarParams) -> jax.Array:
    """Shape-check and reshape a scan to (L, P, 3).

    Accepts (L, P, 3) or flat (L*P, 3) row-major layout (the reference's
    input convention). Raises at trace time on mismatch — the analogue of
    ``validateLidarScan`` (``common.h:104-113``).
    """
    L, P = lidar.scan_lines, lidar.points_per_line
    if scan.ndim == 2 and scan.shape == (L * P, 3):
        return scan.reshape(L, P, 3)
    if scan.ndim == 3 and scan.shape == (L, P, 3):
        return scan
    raise ValueError(
        f"LOAM: provided lidar scan shape {scan.shape} does not match provided "
        f"lidar parameters ({L} x {P})"
    )


def _shift(x: jax.Array, k: int, fill=0):
    """Shift along the last axis by k (positive = towards higher index),
    zero/fill padding — never wraps across scan lines."""
    if k == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if k > 0:
        pad[-1] = (k, 0)
        return jnp.pad(x, pad, constant_values=fill)[..., : x.shape[-1]]
    pad[-1] = (0, -k)
    return jnp.pad(x, pad, constant_values=fill)[..., -k:]


def compute_curvature(
    scan: jax.Array, lidar: LidarParams, params: FeatureExtractionParams
) -> jax.Array:
    """Curvature (L, P); -1 sentinel on the first/last ``neighbor_points``
    of each line (reference ``features-inl.h:66-69``)."""
    pts = validate_scan(scan, lidar)
    L, P = lidar.scan_lines, lidar.points_per_line
    N = params.neighbor_points
    # stencil: d = sum_n (p_{j-n} + p_{j+n}) - 2N p_j, via static padded slices
    padded = jnp.pad(pts, ((0, 0), (N, N), (0, 0)))
    d = (-2.0 * N) * pts
    for n in range(1, N + 1):
        d = d + padded[:, N - n : N - n + P] + padded[:, N + n : N + n + P]
    c = jnp.sum(d * d, axis=-1)
    j = jnp.arange(P)
    interior = (j >= N) & (j < P - N)
    return jnp.where(interior[None, :], c, jnp.asarray(-1.0, c.dtype))


def compute_valid_points(
    scan: jax.Array, lidar: LidarParams, params: FeatureExtractionParams
) -> jax.Array:
    """Validity mask (L, P) bool — vectorized form of the reference's four
    sequential checks (see module docstring for the equivalence argument)."""
    pts = validate_scan(scan, lidar)
    L, P = lidar.scan_lines, lidar.points_per_line
    N = params.neighbor_points
    r = jnp.linalg.norm(pts, axis=-1)  # (L, P)
    j = jnp.arange(P)[None, :]

    # CHECK 1: line edges
    c1 = (j < N) | (j >= P - N)
    not_c1 = ~c1

    # CHECK 2: out-of-range; clears j-N .. j+N
    f2 = not_c1 & ((r < lidar.min_range) | (r > lidar.max_range))
    inv2 = jnp.zeros_like(f2)
    for n in range(-N, N + 1):
        inv2 = inv2 | _shift(f2, n, fill=False)

    # CHECK 3: occlusion. Ranges at j+1 valid wherever the check can fire
    # (j <= P-N-1 since ~c1 and N >= 1).
    r_next = _shift(r, -1)
    gate3 = not_c1 & ~f2
    f3a = gate3 & (r_next - r > params.occlusion_thresh)  # case 1: clears j+1..j+N
    f3b = gate3 & (r - r_next > params.occlusion_thresh)  # case 2: clears j-N+1..j
    inv3 = jnp.zeros_like(f3a)
    for n in range(1, N + 1):
        inv3 = inv3 | _shift(f3a, n, fill=False)
    for n in range(0, N):
        inv3 = inv3 | _shift(f3b, -n, fill=False)

    # CHECK 4: beam-parallel surface; clears self only
    r_prev = _shift(r, 1)
    gate4 = gate3 & ~(f3a | f3b)
    diff_a = jnp.abs(r_prev - r)
    diff_b = jnp.abs(r_next - r)
    f4 = gate4 & (diff_a > params.parallel_thresh * r) & (diff_b > params.parallel_thresh * r)

    return ~(c1 | inv2 | inv3 | f4)
