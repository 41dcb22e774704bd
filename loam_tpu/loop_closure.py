"""Loop-closure detection + trajectory optimization.

Completes the SLAM stack above odometry (reference scope ends at
registration; SURVEY §3.4): detect revisits by trajectory proximity, verify
each candidate by feature registration, and feed accepted closures plus the
odometry chain into the pose-graph optimizer.

All stages are fixed-shape and batched: candidate selection is a masked
top-K over the pairwise keyframe-distance matrix, verification is one
``register_features_batch`` call over all candidates in lockstep, and
acceptance is per-candidate masking (failed verifications become masked
pose-graph edges — no host branching).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .features.types import FeatureSet
from .geometry import Pose3, quat_conjugate, quat_multiply, quat_rotate
from .neighbors.bruteforce import topk_min
from .params import RegistrationParams, TerminationType
from .pose_graph import PoseGraphEdges, odometry_edges, optimize_pose_graph
from .registration.icf import _register


class LoopClosures(NamedTuple):
    """K candidate/verified closures ((K,) leaves; invalid slots masked)."""

    i: jax.Array  # (K,) earlier keyframe
    j: jax.Array  # (K,) later keyframe
    measurement: Pose3  # (K, ...) i_T_j from verification
    accepted: jax.Array  # (K,) bool
    inlier_frac: jax.Array  # (K,) associated fraction of source features
    mean_residual: jax.Array  # (K,) mean |point-to-feature| residual at est


@functools.partial(jax.jit, static_argnames=("max_candidates", "min_separation"))
def propose_candidates(
    trajectory: Pose3,
    max_candidates: int = 8,
    min_separation: int = 10,
    max_distance: float = 3.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-K closest (i, j) keyframe pairs with |i-j| >= min_separation.

    Returns (i, j, valid) each (K,); i < j.
    """
    t = trajectory.translation  # (N, 3)
    N = t.shape[0]
    d = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    ii = jnp.arange(N)
    sep_ok = (ii[None, :] - ii[:, None]) >= min_separation  # j - i, upper tri
    d = jnp.where(sep_ok, d, jnp.inf)
    flat = d.reshape(-1)
    vals, pos = topk_min(flat[None], min(max_candidates, flat.shape[0]))
    vals, pos = vals[0], pos[0]
    valid = jnp.isfinite(vals) & (vals < max_distance)
    i = pos // N
    j = pos % N
    return i.astype(jnp.int32), j.astype(jnp.int32), valid


def closure_quality(
    est: Pose3,
    source: FeatureSet,
    target: FeatureSet,
    reg_params: RegistrationParams = RegistrationParams(),
):
    """Post-fit quality of a registration: (inlier_frac, mean_residual).

    Re-associates the source at the final pose and evaluates the raw
    point-to-line/plane residuals there. ``inlier_frac`` = valid
    associations / valid source features; ``mean_residual`` = mean absolute
    residual over the associated set (meters). A registration that CONVERGED
    into a wrong local minimum shows up here as few inliers and/or large
    residuals — convergence alone cannot distinguish it.
    """
    from .registration.associate import associate_edges, associate_planes
    from .registration.solver import _Problem, _residuals

    dtype = source.edge_points.dtype
    qe = est.act(source.edge_points)
    qp = est.act(source.planar_points)
    ea = associate_edges(
        qe, source.edge_mask, target.edge_points, target.edge_mask, reg_params
    )
    pa = associate_planes(
        qp, source.planar_mask, target.planar_points, target.planar_mask,
        reg_params,
    )
    r, _, _, mask = _residuals(
        _Problem(pts_edge=qe, edge=ea, pts_plane=qp, plane=pa),
        Pose3.identity(dtype),
    )
    n_assoc = jnp.sum(mask, dtype=jnp.int32)
    n_src = jnp.sum(source.edge_mask, dtype=jnp.int32) + jnp.sum(
        source.planar_mask, dtype=jnp.int32
    )
    frac = n_assoc / jnp.maximum(n_src, 1).astype(dtype)
    mean_r = jnp.sum(jnp.where(mask, jnp.abs(r), 0.0)) / jnp.maximum(
        n_assoc, 1
    ).astype(dtype)
    return frac, mean_r


def verify_closures(
    trajectory: Pose3,
    features: FeatureSet,
    cand_i: jax.Array,
    cand_j: jax.Array,
    cand_valid: jax.Array,
    reg_params: RegistrationParams = RegistrationParams(),
    min_inlier_frac: float = 0.35,
    max_mean_residual: float = 0.25,
) -> LoopClosures:
    """Register keyframe j's features against keyframe i's for each candidate.

    Args:
      trajectory: (N, ...) current world pose estimates.
      features: FeatureSet batch with leading axis N (per-keyframe features
        in their own sensor frames).
      min_inlier_frac / max_mean_residual: post-fit quality gates (see
        :func:`closure_quality`).

    Accepts a closure only when registration CONVERGED **and** the post-fit
    quality passes — a converged-but-wrong local minimum (e.g. aliased
    geometry) must not become a high-weight pose-graph edge.
    """
    Ti = jax.tree.map(lambda x: x[cand_i], trajectory)
    Tj = jax.tree.map(lambda x: x[cand_j], trajectory)
    # init = current relative estimate i_T_j
    init = Pose3(
        quat_multiply(quat_conjugate(Ti.rotation), Tj.rotation),
        quat_rotate(
            quat_conjugate(Ti.rotation), Tj.translation - Ti.translation
        ),
    )
    src = jax.tree.map(lambda x: x[cand_j], features)
    tgt = jax.tree.map(lambda x: x[cand_i], features)
    est, detail = jax.vmap(
        lambda s, t, p: _register(s, t, p, reg_params, with_matches=False)
    )(src, tgt, init)
    frac, mean_r = jax.vmap(
        lambda e, s, t: closure_quality(e, s, t, reg_params)
    )(est, src, tgt)
    accepted = (
        cand_valid
        & (detail.termination == TerminationType.CONVERGED)
        & (frac >= min_inlier_frac)
        & (mean_r <= max_mean_residual)
    )
    return LoopClosures(cand_i, cand_j, est, accepted, frac, mean_r)


def closure_edges(closures: LoopClosures, weight: float = 10.0) -> PoseGraphEdges:
    """Pose-graph edges from verified closures (rejected ones masked out)."""
    K = closures.i.shape[0]
    return PoseGraphEdges(
        i=closures.i,
        j=closures.j,
        measurement=closures.measurement,
        weight=jnp.full((K,), weight, closures.measurement.translation.dtype),
        mask=closures.accepted,
    )


def optimize_trajectory_with_closures(
    trajectory: Pose3,
    features: FeatureSet,
    reg_params: RegistrationParams = RegistrationParams(),
    max_candidates: int = 8,
    min_separation: int = 10,
    max_distance: float = 3.0,
    closure_weight: float = 10.0,
    iterations: int = 10,
    min_inlier_frac: float = 0.35,
    max_mean_residual: float = 0.25,
) -> Tuple[Pose3, LoopClosures]:
    """End-to-end: propose -> verify -> pose-graph optimize.

    Returns (optimized trajectory, the closures used).
    """
    ci, cj, cv = propose_candidates(
        trajectory, max_candidates, min_separation, max_distance
    )
    closures = verify_closures(
        trajectory, features, ci, cj, cv, reg_params,
        min_inlier_frac=min_inlier_frac,
        max_mean_residual=max_mean_residual,
    )
    odo = odometry_edges(trajectory)
    clo = closure_edges(closures, closure_weight)
    edges = PoseGraphEdges(
        i=jnp.concatenate([odo.i, clo.i]),
        j=jnp.concatenate([odo.j, clo.j]),
        measurement=jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), odo.measurement, clo.measurement
        ),
        weight=jnp.concatenate([odo.weight, clo.weight]),
        mask=jnp.concatenate([odo.mask, clo.mask]),
    )
    opt, _ = optimize_pose_graph(trajectory, edges, iterations=iterations)
    return opt, closures
