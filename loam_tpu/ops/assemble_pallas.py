"""Pallas kernel for assembling picked feature coordinates.

The extraction driver ends by gathering the picked points' coordinates out
of the scan: ``pts[flat_idx]`` for ~24k picks from a 65k-point scan. XLA
lowers that to a serialized gather (~2.2 ms/run in extraction traces — the
same scatter/gather weakness the kNN and sort paths already avoid). This
kernel replaces it with the iota-compare + masked-reduce idiom: for each
scan line, build ``eq[p, c] = (p == picks[c])`` and reduce the masked
coordinate columns over the point axis (sublanes — the cheap reduction
axis). Work is ~L * P * C_pad vector ops, all in VMEM, streaming the scan
and the picks exactly once.

Semantics match the gather exactly: picks are within-line point indices,
``-1`` (or any negative) yields zeros — the driver's ``where(mask, p, 0)``
padding convention. Duplicate picks are allowed (each output slot reduces
its own one-hot row).

Reference context: this implements the coordinate copy-out of
``extractSectorEdgeFeatures``/``extractSectorPlanarFeatures`` pushing
``scan.at(idx)`` into the output vectors (``features-inl.h:146,168``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("LOAM_PALLAS_INTERPRET", "0") == "1"


def _select_kernel(x_ref, y_ref, z_ref, picks_ref, ox_ref, oy_ref, oz_ref,
                   *, n_lines):
    """Single launch; coords are (Ppad, Lpad) lane-per-line, picks/outs are
    (Lpad8, Cpad) line-per-sublane. Lines unroll statically — every op is a
    full-width vector op with explicit broadcasts (Mosaic has no implicit
    sub-shape or i1 broadcast) and static slices only."""
    p = x_ref.shape[0]
    c = picks_ref.shape[1]
    iota = lax.broadcasted_iota(jnp.int32, (p, c), 0)
    pk = picks_ref[...]
    srcs = (x_ref[...], y_ref[...], z_ref[...])
    for l in range(n_lines):
        pk_l = jnp.broadcast_to(pk[l:l + 1, :], (p, c))
        eq = iota == pk_l  # (P, C); negative picks match nothing
        for src, dst in zip(srcs, (ox_ref, oy_ref, oz_ref)):
            col = jnp.broadcast_to(src[:, l:l + 1], (p, c))
            sel = jnp.where(eq, col, jnp.asarray(0.0, col.dtype))
            dst[l:l + 1, :] = jnp.sum(sel, axis=0, keepdims=True)


def resolved_assemble_impl(impl: str, dtype) -> str:
    """Resolve the feature-assemble impl knob: auto = the Pallas kernel on
    a real TPU backend with f32 data (the kernel is f32-only; interpret
    mode counts as the staged-XLA fallback), gather elsewhere. Shared by
    :func:`select_points` and the extraction batch fence
    (``features/extract.py``) so the two can never drift."""
    if impl != "auto":
        return impl
    from .knn_pallas import pallas_supported

    return (
        "pallas"
        if (pallas_supported() and not _INTERPRET and dtype == jnp.float32)
        else "gather"
    )


def select_points(pts: jax.Array, picks: jax.Array, impl: str = "auto"):
    """Per-line coordinate selection: out[l, c] = pts[l, picks[l, c]].

    Args:
      pts: (L, P, 3) scan points.
      picks: (L, C) int32 within-line indices; negative -> zeros.
      impl: "auto" (Pallas on a real TPU, gather elsewhere), "gather",
        or "pallas" (honors LOAM_PALLAS_INTERPRET for CPU coverage).
    Returns:
      (L, C, 3) selected coordinates, zeros at negative picks.
    """
    L, P, _ = pts.shape
    C = picks.shape[1]
    impl = resolved_assemble_impl(impl, pts.dtype)
    if impl == "gather":
        sel = jnp.take_along_axis(
            pts, jnp.maximum(picks, 0)[..., None], axis=1
        )
        return jnp.where(picks[..., None] >= 0, sel, 0)

    cpad = max(-(-C // 128) * 128, 128)
    ppad = max(-(-P // 8) * 8, 8)
    lpad = max(-(-L // 128) * 128, 128)  # coords lane axis
    lpad8 = max(-(-L // 8) * 8, 8)  # picks/out sublane axis
    picks_p = jnp.pad(picks.astype(jnp.int32),
                      ((0, lpad8 - L), (0, cpad - C)),
                      constant_values=-1)
    # (P, L) per-coordinate columns; padding rows can never match a pick
    # (picks are < P)
    coords = [
        jnp.pad(pts[:, :, a].T, ((0, ppad - P), (0, lpad - L)))
        for a in range(3)
    ]
    kern = functools.partial(_select_kernel, n_lines=L)
    outs = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM)
            for x in (*coords, picks_p)
        ],
        out_specs=[
            pl.BlockSpec((lpad8, cpad), lambda: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lpad8, cpad), pts.dtype) for _ in range(3)
        ],
        interpret=_INTERPRET,
    )(*coords, picks_p)
    return jnp.stack([o[:L, :C] for o in outs], axis=-1)
