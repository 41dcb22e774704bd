"""Scan dewarping (intra-scan motion compensation).

A spinning LiDAR sweeps its columns over ~100 ms; under motion, points from
different columns are captured from different sensor poses, smearing the
scan. The reference explicitly leaves dewarping to users (its README scopes
the library to extraction + registration); this module completes that layer:
given the estimated motion over the sweep (e.g. the previous frame's
relative pose under a constant-velocity assumption), each column is re-expressed
in the END-of-sweep frame by interpolating the motion along the azimuth
angle.

Convention: column c of ``points_per_line`` was captured at sweep fraction
``alpha = c / P`` through the motion ``begin_T_end``; dewarping maps every
point into the end-of-sweep frame:

    p_end = ( Exp((1 - alpha) * log(begin_T_end)) )^{-1} applied suitably

implemented as the screw interpolation ``pose(alpha) = Exp(alpha * xi)``
with ``xi = log(begin_T_end)``, and ``p' = pose(alpha)^{-1} . p`` after
shifting so that ``alpha = 1`` is the identity (end frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import (
    Pose3,
    quat_conjugate,
    quat_exp,
    quat_log,
    quat_rotate,
    se3_exp,
    se3_log,
)
from .params import LidarParams


@functools.partial(jax.jit, static_argnames=("lidar", "exact"))
def dewarp_scan(
    scan: jax.Array,
    begin_T_end: Pose3,
    lidar: LidarParams,
    exact: bool = False,
) -> jax.Array:
    """Motion-compensate a scan into its end-of-sweep frame.

    Args:
      scan: (L, P, 3) or (L*P, 3) range-image scan (sensor frame, as swept).
      begin_T_end: sensor motion over this sweep (e.g. the previous frame's
        registered relative pose for a constant-velocity prediction).
      exact: interpolation law for the per-column pose. False (default):
        rotation by ``Exp(beta * log R)`` but translation LINEARLY as
        ``beta * t`` — a deliberate approximation whose error is
        ``(V(beta*w) * V(w)^{-1} - beta I) t``, zero for pure translation or
        pure rotation and bounded by ~``theta * |t| / 4`` mixed (sub-mm for
        typical 10 Hz motion; measured e2e-neutral, so it stays default).
        True: exact constant-twist screw ``Exp(beta * se3_log(motion))``
        with the V-matrix translation (``geometry.se3_exp``) — the true
        trajectory of a sensor moving at constant body velocity; use for
        aggressive motion (fast yaw + long translation per sweep).

    Returns: dewarped scan, same shape as the input.
    """
    L, P = lidar.scan_lines, lidar.points_per_line
    shape_in = scan.shape
    pts = scan.reshape(L, P, 3)
    dtype = pts.dtype

    # column c captured at pose(alpha) = Exp(alpha * xi); express in the end
    # frame: p' = pose(1)^{-1} pose(alpha) . p; use beta = alpha - 1 in
    # [-1, 0]: rel = Exp(beta * xi) (exact for constant twist; see docstring
    # for the default path's translation approximation)
    alpha = (jnp.arange(P, dtype=dtype) + 0.5) / P  # (P,)
    beta = alpha - 1.0
    if exact:
        motion = Pose3(
            begin_T_end.rotation.astype(dtype),
            begin_T_end.translation.astype(dtype),
        )
        xi = se3_log(motion)  # (6,)
        rel = se3_exp(beta[:, None] * xi[None, :])
        q = rel.rotation  # (P, 4)
        t = rel.translation  # (P, 3)
    else:
        xi_rot = quat_log(begin_T_end.rotation.astype(dtype))  # (3,)
        xi_t = begin_T_end.translation.astype(dtype)  # (3,)
        q = quat_exp(beta[:, None] * xi_rot[None, :])  # (P, 4)
        t = beta[:, None] * xi_t[None, :]  # (P, 3)

    # points of column c: p' = R(beta_c) p + t(beta_c), broadcast over lines
    rotated = quat_rotate(q[None, :, :], pts)  # (L, P, 3)
    out = rotated + t[None, :, :]
    # empty cells (zeros => invalid downstream) must stay empty
    keep = jnp.sum(pts * pts, axis=-1, keepdims=True) > 0
    out = jnp.where(keep, out, pts)
    return out.reshape(shape_in)
