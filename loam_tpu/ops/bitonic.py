"""Batched bitonic sort along the leading (sublane) axis.

Replaces the extraction driver's batched ``lax.sort`` over (line, sector)
curvature slices. XLA lowers ``sort`` to a fixed-cost library call that
dominated extraction traces (~3.5 ms/run at Ouster-64 scale for 384 sorts
of ~179 elements); a bitonic network is a better fit for this shape on TPU:

  * the sort axis sits on SUBLANES and the 384 independent slices on LANES,
    so every compare-exchange is a full-width vector min/max between row
    blocks — no lane shuffles;
  * partner alignment is a static sublane rotate (``jnp.roll``) — the XOR
    partner of every row at distance j is reachable by rolling the array
    +-j rows, with statically known row masks picking which rotation and
    which of min/max each row keeps;
  * the whole network (log2(n)*(log2(n)+1)/2 substeps) unrolls at trace
    time into elementwise ops XLA/Mosaic fuse; the Pallas wrapper keeps all
    operands in VMEM for the full network.

Semantics: ascending lexicographic order on the first ``num_keys`` arrays;
remaining arrays are carried through the same permutation. The network is
NOT stable — callers wanting ``lax.sort(is_stable=True)`` parity must
include a unique tie-break (e.g. the slot index) as the last key, which
makes the order total and the result identical. Equal-keyed elements (e.g.
+inf padding rows whose payloads are also identical) are never swapped, so
fully-duplicate padding is safe without a tie-break.

Reference context: the sector sort this accelerates implements the
reference's per-sector ``std::sort`` of curvature slices
(``features-inl.h:38``); ordering semantics are pinned by the extraction
driver, not here.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("LOAM_PALLAS_INTERPRET", "0") == "1"


def _f32_safe(arrays) -> bool:
    """The Pallas kernels handle f32/int32 operands only (no f64 on
    Mosaic); wider dtypes fall back to the same network as plain XLA ops."""
    return all(
        not jnp.issubdtype(x.dtype, jnp.floating) or x.dtype == jnp.float32
        for x in arrays
    )


def _lex_lt(a_keys, b_keys):
    """Strict lexicographic a < b over parallel key tuples (elementwise)."""
    lt = a_keys[-1] < b_keys[-1]
    for ak, bk in zip(reversed(a_keys[:-1]), reversed(b_keys[:-1])):
        lt = (ak < bk) | ((ak == bk) & lt)
    return lt


def bitonic_network(arrays: Sequence[jax.Array], num_keys: int):
    """Run the bitonic network on (n, B) value arrays; n a power of two.

    Pure jnp ops on values — shared by the XLA entry point and the Pallas
    kernel body. Returns the arrays sorted ascending-lexicographically by
    the first ``num_keys`` arrays along axis 0.
    """
    n, lanes = arrays[0].shape
    assert n & (n - 1) == 0, "bitonic network needs power-of-two rows"
    arrays = list(arrays)
    # iota-built masks (not numpy constants): the Pallas kernel body shares
    # this function and closed-over constants can't be captured by kernels.
    # Full-width (n, lanes): Mosaic cannot broadcast (n, 1) i1 masks.
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 0)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            # Row i partners with i^j; a-side rows (i & j == 0) look +j
            # ahead, b-side rows look -j behind. Both partner views come
            # from the two rotations; static masks select per row.
            a_mask = (rows & j) == 0
            desc = (rows & k) != 0
            keep_min = a_mask ^ desc  # (n, lanes)

            fwd = [jnp.roll(x, -j, axis=0) for x in arrays]
            bwd = [jnp.roll(x, j, axis=0) for x in arrays]
            partner = [jnp.where(a_mask, f, b) for f, b in zip(fwd, bwd)]

            self_keys = tuple(arrays[:num_keys])
            part_keys = tuple(partner[:num_keys])
            p_lt = _lex_lt(part_keys, self_keys)
            p_gt = _lex_lt(self_keys, part_keys)
            # boolean algebra, not select_n: Mosaic rejects i1 selects
            take_partner = (keep_min & p_lt) | (~keep_min & p_gt)
            arrays = [
                jnp.where(take_partner, p, x) for x, p in zip(arrays, partner)
            ]
            j //= 2
        k *= 2
    return tuple(arrays)


def bitonic_network_1d(arrays: Sequence[jax.Array], num_keys: int, n: int):
    """Bitonic network over ONE logical sequence of length ``n`` laid out
    lane-major on (R, 128) arrays: linear index i lives at
    (row = i % R, lane = i // R).

    With this layout the XOR partner at distance d < R is a sublane rotate
    and at d >= R a lane rotate (d and R are powers of two, so d >= R is
    always a whole-lane distance) — the only two cheap data movements on
    the VPU. Only log2(n) - log2(R) of the log-squared substeps touch
    lanes. Same ordering semantics as :func:`bitonic_network`.
    """
    r, lanes = arrays[0].shape
    assert n == r * lanes and n & (n - 1) == 0
    arrays = list(arrays)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1)
    linear = lane * r + row
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            a_mask = (linear & j) == 0
            desc = (linear & k) != 0
            keep_min = a_mask ^ desc

            if j < r:
                fwd = [jnp.roll(x, -j, axis=0) for x in arrays]
                bwd = [jnp.roll(x, j, axis=0) for x in arrays]
            else:
                jl = j // r
                fwd = [jnp.roll(x, -jl, axis=1) for x in arrays]
                bwd = [jnp.roll(x, jl, axis=1) for x in arrays]
            partner = [jnp.where(a_mask, f, b) for f, b in zip(fwd, bwd)]

            self_keys = tuple(arrays[:num_keys])
            part_keys = tuple(partner[:num_keys])
            p_lt = _lex_lt(part_keys, self_keys)
            p_gt = _lex_lt(self_keys, part_keys)
            # boolean algebra, not select_n: Mosaic rejects i1 selects
            take_partner = (keep_min & p_lt) | (~keep_min & p_gt)
            arrays = [
                jnp.where(take_partner, p, x) for x, p in zip(arrays, partner)
            ]
            j //= 2
        k *= 2
    return tuple(arrays)


def bitonic_sort_1d(
    arrays: Sequence[jax.Array], num_keys: int
) -> Tuple[jax.Array, ...]:
    """Sort flat (n,) arrays ascending-lexicographically by the first
    ``num_keys``; remaining arrays carried. Unstable network — include a
    unique tie-break key (e.g. an index) for deterministic total order.

    Pads n to a power of two (>= 1024 so the 2-D layout is full): +inf in a
    floating first key, int32 max in an integer first key, zeros elsewhere;
    padding sorts to the end and is sliced off.

    XLA network form only: the round-2/3 single-launch Pallas wrapper
    never lowered on the v5e runtime (Mosaic rejected its lane rotations —
    the failure in the round-3 hardware battery log) and was auto-off dead
    weight, pruned in round 4 per the measured verdict that non-kNN ICF
    work is not on the critical path.
    """
    n = arrays[0].shape[0]
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    padded = []
    for i, x in enumerate(arrays):
        if i < num_keys:
            # max-fill EVERY key column: pads must sort after all real rows
            # even when real rows share a +inf / intmax first key
            fill = (
                jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                else jnp.iinfo(x.dtype).max
            )
        else:
            fill = 0
        padded.append(
            jnp.pad(x, (0, n_pad - n), constant_values=fill)
        )
    # lane-major 2-D layout: linear i -> (row i % R, lane i // R)
    r = n_pad // 128
    arrs2 = [x.reshape(128, r).T for x in padded]
    out = bitonic_network_1d(arrs2, num_keys, n_pad)
    return tuple(x.T.reshape(n_pad)[:n] for x in out)


def _sort_kernel(*refs, num_arrays: int, num_keys: int):
    in_refs = refs[:num_arrays]
    out_refs = refs[num_arrays:]
    vals = [r[...] for r in in_refs]
    out = bitonic_network(vals, num_keys)
    for r, v in zip(out_refs, out):
        r[...] = v


def bitonic_sort(
    arrays: Sequence[jax.Array], num_keys: int, impl: str = "auto"
) -> Tuple[jax.Array, ...]:
    """Sort (n, B) arrays ascending by the first ``num_keys`` along axis 0.

    Rows are padded to the next power of two internally; padding rows carry
    +inf in the first key (sorting after every finite row) and zeros
    elsewhere, and are sliced off before returning. Callers whose data may
    contain +inf keys must pre-pad themselves.

    impl: "auto" (Pallas on a real TPU, plain XLA elsewhere — interpret
    mode counts as elsewhere: the big unrolled network is pathologically
    slow under the interpreter), "xla", or "pallas" (honors
    LOAM_PALLAS_INTERPRET, for kernel-body coverage on CPU).
    """
    n, b = arrays[0].shape
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 0)
    if n_pad != n:
        padded = []
        for i, x in enumerate(arrays):
            if i < num_keys:
                # max-fill EVERY key column so pads sort after all real
                # rows even when real rows carry a +inf first key
                fill = jnp.asarray(
                    jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.iinfo(x.dtype).max,
                    x.dtype,
                )
            else:
                fill = jnp.asarray(0, x.dtype)
            pad = jnp.full((n_pad - n, b), fill, x.dtype)
            padded.append(jnp.concatenate([x, pad], axis=0))
        arrays = padded
    if impl == "auto":
        from .knn_pallas import pallas_supported

        impl = (
            "pallas"
            if (pallas_supported() and not _INTERPRET and _f32_safe(arrays))
            else "xla"
        )
    if impl == "pallas":
        kern = functools.partial(
            _sort_kernel, num_arrays=len(arrays), num_keys=num_keys
        )
        out = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, b), x.dtype) for x in arrays
            ],
            interpret=_INTERPRET,
        )(*arrays)
    else:
        out = bitonic_network(arrays, num_keys)
    return tuple(x[:n] for x in out)
