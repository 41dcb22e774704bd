"""Pallas kernel for the serial greedy NMS feature pick.

The greedy pick (reference ``extractSectorEdgeFeatures`` /
``extractSectorPlanarFeatures``, ``features-inl.h:137-180``) is inherently
serial within a scan line: every accepted feature suppresses neighbors, and
sectors are processed in order with cross-sector suppression (§2.3(4,5)).
The XLA implementation (``features/extract.py::_greedy_pass``) runs it as
per-line ``lax.scan``s whose (window, lines) carry round-trips through HBM
on every one of the ~2 * sectors * sector_size steps per scan — the stage
was 32% of device time before static windowing and remains memory-bound
after it.

This kernel runs the ENTIRE serial stage (all sectors, both classes, all
lines) in one launch with the evolving validity mask resident in VMEM.
Layout: points on SUBLANES, scan lines on LANES — every per-step op is a
full-width vector op over all lines at once, and the one reduction
(candidate liveness) runs along sublanes, the cheap axis. The step loop is
a ``fori_loop`` over candidate slots; sector/class loops are static.

Output is bit-identical to the XLA path: same visit order, same
cap-overshoot (+1) semantics, same suppression window, same masked no-op
visits for already-suppressed candidates.
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


def _nms_kernel(
    valid_ref, cand_e_ref, cand_p_ref, pe_ref, pp_ref,
    *, n_sectors, s_max, max_e, max_p, n, pps, p_total,
):
    rows, lanes = valid_ref.shape
    mask = valid_ref[...]  # (P, Lp) int32 0/1 — i1 full-array carries and
    # dynamic_update_slice both fail Mosaic lowering; the evolving mask
    # lives as i32 and sector slices convert at the boundary.
    for s in range(n_sectors):
        size = s_max if s == n_sectors - 1 else pps
        lo = max(s * pps - (n - 1), 0)
        hi = min(s * pps + size + (n - 1), p_total)
        w = hi - lo
        # the window mask stays i32 across the fori_loop carry — Mosaic
        # cannot legalize scf.for with vector<i1> loop carries
        msl_i32 = lax.slice_in_dim(mask, lo, hi, axis=0)
        iota_w = lax.broadcasted_iota(jnp.int32, (w, lanes), 0) + jnp.int32(lo)

        for cand_ref, out_ref, max_f in (
            (cand_e_ref, pe_ref, max_e),
            (cand_p_ref, pp_ref, max_p),
        ):
            cap = max_f + 1
            iota_cap = lax.broadcasted_iota(jnp.int32, (cap, lanes), 0)
            picks0 = jnp.full((cap, lanes), -1, jnp.int32)
            cnt0 = jnp.zeros((1, lanes), jnp.int32)

            def step(t, carry, cand_ref=cand_ref, iota_w=iota_w,
                     iota_cap=iota_cap, max_f=max_f, s=s):
                msl_i, cnt, picks = carry
                msl = msl_i != 0
                idx = cand_ref[pl.ds(s * s_max + t, 1), :]  # (1, Lp)
                # all broadcasts made explicit in i32 — Mosaic rejects
                # implicit i1 (and some sub-shape) vector broadcasts
                idx_w = jnp.broadcast_to(idx, iota_w.shape)
                eq = iota_w == idx_w
                live = jnp.any(eq & msl, axis=0, keepdims=True)
                ok = live & (idx >= 0) & (cnt <= max_f)  # (1, lanes)
                ok_i = ok.astype(jnp.int32)
                ok_cap = jnp.broadcast_to(ok_i, iota_cap.shape) != 0
                ok_w = jnp.broadcast_to(ok_i, iota_w.shape) != 0
                cnt_cap = jnp.broadcast_to(cnt, iota_cap.shape)
                idx_cap = jnp.broadcast_to(idx, iota_cap.shape)
                picks = jnp.where(
                    (iota_cap == cnt_cap) & ok_cap, idx_cap, picks
                )
                msl = msl & ~(ok_w & (jnp.abs(iota_w - idx_w) <= n - 1))
                cnt = cnt + ok_i
                return msl.astype(jnp.int32), cnt, picks

            msl_i32, _, picks = lax.fori_loop(
                0, s_max, step, (msl_i32, cnt0, picks0)
            )
            out_ref[s * cap:(s + 1) * cap, :] = picks
        # write the sector window back via static slices + concat
        # (dynamic_update_slice has no Mosaic lowering; lo/hi are static)
        parts = []
        if lo > 0:
            parts.append(lax.slice_in_dim(mask, 0, lo, axis=0))
        parts.append(msl_i32)
        if hi < rows:
            parts.append(lax.slice_in_dim(mask, hi, rows, axis=0))
        mask = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def greedy_nms(
    valid: jax.Array,
    cand_e_all: jax.Array,
    cand_p_all: jax.Array,
    max_e: int,
    max_p: int,
    n: int,
    pps: int,
    s_max: int,
):
    """Greedy sector NMS over all lines in one kernel launch.

    Args:
      valid: (L, P) bool validity mask.
      cand_e_all / cand_p_all: (L, S, s_max) int32 within-line candidate
        indices in processing order (-1 = not a candidate).
      max_e / max_p: per-sector caps (cap+1 slots admitted, §2.3(3)).
      n: neighbor_points (suppression halfwidth).
      pps / s_max: sector span / largest-sector size.
    Returns:
      (edge_picks (L, S, max_e+1), planar_picks (L, S, max_p+1)) int32,
      -1-padded — identical to the per-line XLA scan path.
    """
    L, P = valid.shape
    S = cand_e_all.shape[1]
    lp = max(-(-L // 128) * 128, 128)
    pp_rows = max(-(-P // 8) * 8, 8)

    def prep(x, rows, fill):
        xt = x.reshape(L, -1).T  # (rows_true, L)
        return jnp.pad(
            xt.astype(jnp.int32),
            ((0, rows - xt.shape[0]), (0, lp - L)),
            constant_values=fill,
        )

    valid_t = prep(valid, pp_rows, 0)
    ce_t = prep(cand_e_all, S * s_max, -1)
    cp_t = prep(cand_p_all, S * s_max, -1)
    cap_e, cap_p = max_e + 1, max_p + 1

    kern = functools.partial(
        _nms_kernel,
        n_sectors=S, s_max=s_max, max_e=max_e, max_p=max_p,
        n=n, pps=pps, p_total=P,
    )
    pe, pp_ = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM)
            for x in (valid_t, ce_t, cp_t)
        ],
        out_specs=[
            pl.BlockSpec((S * cap_e, lp), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S * cap_p, lp), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S * cap_e, lp), jnp.int32),
            jax.ShapeDtypeStruct((S * cap_p, lp), jnp.int32),
        ],
        interpret=_INTERPRET,
    )(valid_t, ce_t, cp_t)
    edge_picks = pe[:, :L].T.reshape(L, S, cap_e)
    planar_picks = pp_[:, :L].T.reshape(L, S, cap_p)
    return edge_picks, planar_picks
