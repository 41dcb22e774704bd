"""Pallas kernel for the full LM delta-pose solve.

Runs the reference-pinned inner solve (4 damped Gauss-Newton steps, Huber
delta = 1.0 — Ceres config at ``registration-inl.h:51-56``) as ONE kernel:
residual sweeps, normal-equation reductions, the unrolled 6x6 Cholesky,
twist application and accept/reject logic all stay in VMEM/registers. The
XLA implementation (``registration/solver.py::lm_solve``) is a chain of
small fused ops whose intermediates round-trip through HBM and whose
einsums dispatch as separate dots; device traces put it at ~25% of ICF
iteration time for what is arithmetically a few-microsecond problem.

Formulas mirror ``solver.py`` exactly (same guards, same damping floors,
same accept/reject and lambda schedule); only the reduction ORDER differs
(per-class sublane partial sums, then one lane reduction), so results can
differ in the last ulp — the usual f32 caveat, not a semantics change.

Layout: residual rows are reshaped to (rows/128, 128) per coordinate
component — full-width elementwise math, reductions along sublanes first.
The 28 accumulator quantities (cost, 6 g entries, 21 upper-H entries) are
stacked into one (28, 128) array for a single cross-lane reduction per
sweep.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("LOAM_PALLAS_INTERPRET", "0") == "1"

_LANES = 128


def _pad_rows(comp: jax.Array, fill=0.0):
    """(N,) -> (ceil(N/128), 128) with ``fill`` padding."""
    n = comp.shape[0]
    rows = max(-(-n // _LANES), 1)
    return jnp.pad(
        comp, (0, rows * _LANES - n), constant_values=fill
    ).reshape(rows, _LANES)


def _s(v, dtype=jnp.float32):
    return jnp.full((1, 1), v, dtype)


def _ssum(x):
    """Full reduce of (R, 128) to (1, 1) — sublanes first (cheap axis)."""
    return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1, keepdims=True)


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _quat_rotate(q, v):
    """Rotate component vectors v=(x,y,z) (any shape) by scalar quat q."""
    w, ux, uy, uz = q
    vx, vy, vz = v
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    dx = uy * cz - uz * cy
    dy = uz * cx - ux * cz
    dz = ux * cy - uy * cx
    return (v[0] + 2.0 * (w * cx + dx),
            v[1] + 2.0 * (w * cy + dy),
            v[2] + 2.0 * (w * cz + dz))


def _quat_exp(tx, ty, tz):
    """so(3) exp on scalars — mirrors geometry.quat_exp (sinc expansion)."""
    t2 = tx * tx + ty * ty + tz * tz
    t = jnp.sqrt(t2)
    half = 0.5 * t
    small = t2 < 1e-12
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, t))
    w = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(half))
    return (w, k * tx, k * ty, k * tz)


def _quat_normalize(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    return tuple(c / n for c in q)


def _quat_log(q):
    """Unit quat -> rotvec scalars — mirrors geometry.quat_log."""
    neg = q[0] < 0
    w, ux, uy, uz = tuple(jnp.where(neg, -c, c) for c in q)
    un = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    w = jnp.clip(w, -1.0, 1.0)
    angle = 2.0 * jnp.arctan2(un, w)
    small = un < 1e-9
    scale = jnp.where(
        small, 2.0 / jnp.where(w == 0, 1.0, w), angle / jnp.where(small, 1.0, un)
    )
    return (scale * ux, scale * uy, scale * uz)


def _chol_solve6(H, g):
    """Unrolled 6x6 Cholesky solve on (1,1) scalars (same as solver.py)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = H[j][j]
        for kk in range(j):
            d = d - L[j][kk] * L[j][kk]
        Ljj = jnp.sqrt(jnp.maximum(d, 1e-30))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            v = H[i][j]
            for kk in range(j):
                v = v - L[i][kk] * L[j][kk]
            L[i][j] = v * inv
    y = [None] * n
    for i in range(n):
        v = g[i]
        for kk in range(i):
            v = v - L[i][kk] * y[kk]
        y[i] = v / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        v = y[i]
        for kk in range(i + 1, n):
            v = v - L[kk][i] * x[kk]
        x[i] = v / L[i][i]
    return x


def _lm_kernel(
    pe_ref, ea_ref, eb_ref, ev_ref, pp_ref, pn_ref, pd_ref, pv_ref,
    prior_ref, out_ref,
    *, steps: int, huber_delta: float, prior_weight: float,
):
    # component arrays: (3*Re, 128) stacked x/y/z blocks per operand
    re = pe_ref.shape[0] // 3
    rp = pp_ref.shape[0] // 3

    def comps(ref, r):
        v = ref[...]
        return (v[0 * r:1 * r], v[1 * r:2 * r], v[2 * r:3 * r])

    pe = comps(pe_ref, re)
    ea = comps(ea_ref, re)
    eb = comps(eb_ref, re)
    ev = ev_ref[...]
    pp_ = comps(pp_ref, rp)
    pn = comps(pn_ref, rp)
    pd = pd_ref[...]
    pv = pv_ref[...]

    prior_q = tuple(prior_ref[0:1, i:i + 1] for i in range(4))
    prior_t = tuple(prior_ref[0:1, i:i + 1] for i in range(4, 7))

    hd = huber_delta
    pw = prior_weight

    def bc(vals, r):
        """(1,1) scalars -> (r, 128), lanes first then sublanes — Mosaic
        has no single-op broadcast along both axes. The add is load-bearing:
        it stops JAX re-fusing the two broadcasts into one."""
        zrow = jnp.zeros((1, _LANES), jnp.float32)
        return tuple(
            jnp.broadcast_to(c + zrow, (r, _LANES)) for c in vals
        )

    def sweep(delta):
        """(cost, H, g) at delta — delta = (quat 4-tuple, t 3-tuple)."""
        dq, dt = delta
        acc = []  # list of (1, 128) partial sums, reduced across lanes once

        def accumulate(q, v, rows_extra):
            """rows_extra: class-specific residual+grad -> (r, (gx,gy,gz))"""
            r, (gx, gy, gz) = rows_extra
            # J = [q x g, g]; zero invalid rows with where (NOT "* v":
            # poisoned invalid rows carry NaN and 0 * NaN = NaN)
            ok = v > 0
            j = (
                q[1] * gz - q[2] * gy,
                q[2] * gx - q[0] * gz,
                q[0] * gy - q[1] * gx,
                gx, gy, gz,
            )
            j = tuple(jnp.where(ok, ji, 0.0) for ji in j)
            r = jnp.where(ok, r, 0.0)
            a = jnp.abs(r)
            w = v * jnp.where(a <= hd, 1.0, hd / jnp.where(a > 0, a, 1.0))
            rho = jnp.where(a <= hd, r * r, hd * (2.0 * a - hd))
            rows = [jnp.sum(v * rho, axis=0, keepdims=True)]
            for i in range(6):
                rows.append(jnp.sum(w * j[i] * r, axis=0, keepdims=True))
            for i in range(6):
                for k in range(i, 6):
                    rows.append(jnp.sum(w * j[i] * j[k], axis=0, keepdims=True))
            return rows

        # edges: point-to-line residual (reference geometry-inl.h:21-27)
        dq_e, dt_e = bc(dq, re), bc(dt, re)
        qx, qy, qz = _quat_rotate(dq_e, pe)
        qe = (qx + dt_e[0], qy + dt_e[1], qz + dt_e[2])
        ax_, ay_, az_ = ea
        bx_, by_, bz_ = eb
        ux, uy, uz = qe[0] - ax_, qe[1] - ay_, qe[2] - az_
        vx_, vy_, vz_ = qe[0] - bx_, qe[1] - by_, qe[2] - bz_
        cx = uy * vz_ - uz * vy_
        cy = uz * vx_ - ux * vz_
        cz = ux * vy_ - uy * vx_
        cn = jnp.sqrt(cx * cx + cy * cy + cz * cz)
        wx, wy, wz = ax_ - bx_, ay_ - by_, az_ - bz_
        abn = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        r_e = cn / jnp.where(abn > 0, abn, 1.0)
        denom = jnp.where(cn > 1e-12, cn * abn, 1.0)
        gex = (wy * cz - wz * cy) / denom
        gey = (wz * cx - wx * cz) / denom
        gez = (wx * cy - wy * cx) / denom
        keep = cn > 1e-12
        ge = tuple(jnp.where(keep, g, 0.0) for g in (gex, gey, gez))
        rows_e = accumulate(qe, ev, (r_e, ge))

        # planes: |n.q - d| (reference geometry-inl.h:30-33)
        dq_p, dt_p = bc(dq, rp), bc(dt, rp)
        qx, qy, qz = _quat_rotate(dq_p, pp_)
        qp = (qx + dt_p[0], qy + dt_p[1], qz + dt_p[2])
        s = qp[0] * pn[0] + qp[1] * pn[1] + qp[2] * pn[2] - pd
        r_p = jnp.abs(s)
        sg = jnp.sign(s)
        gp = (sg * pn[0], sg * pn[1], sg * pn[2])
        rows_p = accumulate(qp, pv, (r_p, gp))

        stacked = jnp.concatenate(
            [a + b for a, b in zip(rows_e, rows_p)], axis=0
        )  # (28, 128)
        red = jnp.sum(stacked, axis=1, keepdims=True)  # (28, 1)

        cost = red[0:1, 0:1]
        g = [red[1 + i:2 + i, 0:1] for i in range(6)]
        H = [[None] * 6 for _ in range(6)]
        t = 7
        for i in range(6):
            for k in range(i, 6):
                H[i][k] = red[t:t + 1, 0:1]
                H[k][i] = H[i][k]
                t += 1

        if pw > 0:
            # quadratic prior on (delta o prior_offset) — see solver.py
            tq = _quat_mul(dq, prior_q)
            rt = _quat_rotate(dq, prior_t)
            tt = (rt[0] + dt[0], rt[1] + dt[1], rt[2] + dt[2])
            xi = _quat_log(tq) + tt
            cost = cost + pw * sum(x * x for x in xi)
            for i in range(6):
                H[i][i] = H[i][i] + pw
                g[i] = g[i] + pw * xi[i]
        return cost, H, g

    one = _s(1.0)
    zero = _s(0.0)
    delta = ((one, zero, zero, zero), (zero, zero, zero))
    cost, H, g = sweep(delta)
    lam = _s(1e-4)

    for _ in range(steps):
        diag = [H[i][i] for i in range(6)]
        dmax = diag[0]
        for i in range(1, 6):
            dmax = jnp.maximum(dmax, diag[i])
        Hd = [
            [
                H[i][k] + (lam * diag[i] + 1e-6 * dmax + 1e-10)
                if i == k else H[i][k]
                for k in range(6)
            ]
            for i in range(6)
        ]
        x = _chol_solve6(Hd, g)
        step = [-xi for xi in x]
        sq = _quat_exp(step[0], step[1], step[2])
        dq, dt = delta
        nq = _quat_normalize(_quat_mul(sq, dq))
        rt = _quat_rotate(sq, dt)
        nt = (rt[0] + step[3], rt[1] + step[4], rt[2] + step[5])
        cand = (nq, nt)
        new_cost, new_H, new_g = sweep(cand)
        accept = new_cost < cost
        sel = lambda n_, o_: jnp.where(accept, n_, o_)
        delta = (
            tuple(sel(n_, o_) for n_, o_ in zip(cand[0], delta[0])),
            tuple(sel(n_, o_) for n_, o_ in zip(cand[1], delta[1])),
        )
        cost = sel(new_cost, cost)
        H = [[sel(new_H[i][k], H[i][k]) for k in range(6)] for i in range(6)]
        g = [sel(new_g[i], g[i]) for i in range(6)]
        lam = jnp.where(
            accept, jnp.maximum(lam / 3.0, 1e-12), jnp.minimum(lam * 4.0, 1e8)
        )

    vals = jnp.concatenate(list(delta[0]) + list(delta[1]) + [cost], axis=1)
    out_ref[...] = jnp.pad(vals, ((0, 0), (0, _LANES - 8)))


def lm_solve_pallas(problem, params):
    """Drop-in for ``solver.lm_solve`` running the whole solve in one kernel.

    Same step semantics; reduction order differs (documented f32 ulp-level
    divergence). Returns (delta Pose3, final cost).
    """
    from ..geometry import Pose3

    dtype = jnp.float32

    def pack3(arr):
        # (N, 3) -> (3*rows, 128) stacked component blocks
        return jnp.concatenate(
            [_pad_rows(arr[:, a].astype(dtype)) for a in range(3)], axis=0
        )

    pe = pack3(problem.pts_edge)
    ea = pack3(problem.edge.line_a)
    eb = pack3(problem.edge.line_b)
    ev = _pad_rows(problem.edge.valid.astype(dtype))
    pp_ = pack3(problem.pts_plane)
    pn = pack3(problem.plane.normal)
    pd = _pad_rows(problem.plane.d.astype(dtype))
    pv = _pad_rows(problem.plane.valid.astype(dtype))

    if problem.prior_offset is not None:
        prior = jnp.concatenate(
            [problem.prior_offset.rotation.astype(dtype),
             problem.prior_offset.translation.astype(dtype)]
        )
    else:
        prior = jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], dtype)
    prior = jnp.pad(prior, (0, _LANES - 7))[None]  # (1, 128)

    kern = functools.partial(
        _lm_kernel,
        steps=int(params.inner_iterations),
        huber_delta=float(params.huber_delta),
        prior_weight=float(params.prior_weight),
    )
    ins = (pe, ea, eb, ev, pp_, pn, pd, pv, prior)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM)
            for x in ins
        ],
        out_specs=pl.BlockSpec((1, _LANES), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, _LANES), dtype),
        interpret=_INTERPRET,
    )(*ins)
    delta = Pose3(out[0, :4], out[0, 4:7])
    return delta, out[0, 7]
