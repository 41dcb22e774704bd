"""Distributed (sharded-target) registration and scan-to-map.

SURVEY config 5: the map no longer fits (or shouldn't live) on one chip.
Recipe (scaling-book style):

  * **Sharded kNN**: map/target points are sharded over the mesh's "data"
    axis. Queries are replicated; every device searches its own shard
    (total work divides by D), then the per-device top-k lists — indices
    made global, plus the neighbor *coordinates* so no cross-shard gather is
    ever needed — are ``all_gather``-ed over ICI and merged with the same
    first-index tie-breaking as the local kernels (device-major concat =
    global index order).
  * **Sharded registration**: the full ICF loop runs under ``shard_map``;
    only the kNN step is collective, association/fit/solve are replicated
    (cheap, and keeps every device's control flow in lockstep so the
    while_loop terminates identically everywhere).
  * **Sharded voxel map**: voxel ownership = hash(voxel) mod D, so every
    voxel has exactly one owner and insertion/dedup is local; the resulting
    distributed map is bit-identical in content to the single-device map.
"""

from __future__ import annotations


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# The modern jax.shard_map tracks varying-axis types strictly, which rejects
# scan carries whose initial value is replicated while the body output is
# device-varying (the LM solver builds such carries internally). The
# deprecated entry point with check_rep=False keeps the untyped behavior.
import warnings as _warnings

with _warnings.catch_warnings():
    _warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..features.types import FeatureSet
from ..geometry import Pose3, quat_multiply, quat_normalize, quat_rotate
from ..map import VoxelMap, voxel_map_empty, voxel_map_insert
from ..map.voxel_map import _voxel_key
from ..neighbors.bruteforce import KnnResult, knn, topk_min
from ..params import RegistrationParams, TerminationType
from ..registration.associate import associate_edges, associate_planes
from ..registration.solver import _Problem, lm_solve
from ..registration.icf import _angle_from_identity


def _sharded_knn(q, t_local, t_mask_local, k, max_dist, axis):
    """Local search + all-gather merge. Runs inside shard_map.

    Returns (KnnResult with GLOBAL indices, neighbor coordinates (Q, k, 3)).
    """
    shard = t_local.shape[0]
    local = knn(q, t_local, t_mask_local, k, max_dist)
    offset = lax.axis_index(axis) * shard
    gidx = local.indices + offset
    npts = t_local[local.indices]  # (Q, k, 3) local gather
    # all_gather along a new leading axis -> device-major == global order
    g_idx = lax.all_gather(gidx, axis)  # (D, Q, k)
    g_d = lax.all_gather(local.distances, axis)
    g_m = lax.all_gather(local.mask, axis)
    g_p = lax.all_gather(npts, axis)  # (D, Q, k, 3)
    D = g_idx.shape[0]
    Q = q.shape[0]
    cand_d = jnp.moveaxis(g_d, 0, 1).reshape(Q, D * k)
    cand_i = jnp.moveaxis(g_idx, 0, 1).reshape(Q, D * k)
    cand_p = jnp.moveaxis(g_p, 0, 1).reshape(Q, D * k, 3)
    cand_m = jnp.moveaxis(g_m, 0, 1).reshape(Q, D * k)
    d = jnp.where(cand_m, cand_d, jnp.inf)
    best_d, pos = topk_min(d, k)  # first-index ties -> lowest device/index
    idx = jnp.take_along_axis(cand_i, pos, axis=1)
    pts = jnp.take_along_axis(cand_p, pos[..., None], axis=1)
    mask = jnp.isfinite(best_d)
    return KnnResult(idx, jnp.where(mask, best_d, jnp.inf), mask), pts


def register_features_sharded(
    source: FeatureSet,
    target: FeatureSet,
    target_T_source_init: Pose3,
    mesh: Mesh,
    params: RegistrationParams = RegistrationParams(),
    axis: str = "data",
) -> Tuple[Pose3, jax.Array, jax.Array]:
    """ICF registration against a target whose features are sharded.

    Target leaves' leading (capacity) axis is sharded over ``axis`` of the
    mesh (capacities must divide the axis size); source and init are
    replicated. Returns (pose, termination code, iterations) — replicated.
    """
    dtype = source.edge_points.dtype
    I = params.max_iterations

    def impl(src_ep, src_em, src_pp, src_pm, tgt_ep, tgt_em, tgt_pp, tgt_pm, init_q, init_t):
        def cond(state):
            est, i, status, done = state
            return (i < I) & ~done

        def body(state):
            est, i, status, done = state
            qe = quat_rotate(est[0][None, :], src_ep) + est[1][None, :]
            qp = quat_rotate(est[0][None, :], src_pp) + est[1][None, :]
            eres, enbr = _sharded_knn(
                qe, tgt_ep, tgt_em, params.num_edge_neighbors,
                params.max_edge_neighbor_dist, axis,
            )
            pres, pnbr = _sharded_knn(
                qp, tgt_pp, tgt_pm, params.num_plane_neighbors,
                params.max_plane_neighbor_dist, axis,
            )
            ea = associate_edges(
                qe, src_em, tgt_ep, tgt_em, params, knn_result=eres,
                neighbor_pts=enbr,
            )
            pa = associate_planes(
                qp, src_pm, tgt_pp, tgt_pm, params, knn_result=pres,
                neighbor_pts=pnbr,
            )
            n_assoc = jnp.sum(ea.valid, dtype=jnp.int32) + jnp.sum(
                pa.valid, dtype=jnp.int32
            )
            insufficient = n_assoc < params.min_associations
            problem = _Problem(pts_edge=qe, edge=ea, pts_plane=qp, plane=pa)
            delta, _ = lax.cond(
                insufficient,
                lambda p: (Pose3.identity(dtype), jnp.asarray(0.0, dtype)),
                lambda p: lm_solve(p, params),
                problem,
            )
            new_q = quat_normalize(quat_multiply(delta.rotation, est[0]))
            new_t = quat_rotate(delta.rotation, est[1]) + delta.translation
            angle = _angle_from_identity(delta.rotation)
            shift = jnp.linalg.norm(delta.translation)
            converged = (angle < params.rotation_convergence_thresh) & (
                shift < params.position_convergence_thresh
            )
            est_q = jnp.where(insufficient, est[0], new_q)
            est_t = jnp.where(insufficient, est[1], new_t)
            status = jnp.where(
                insufficient,
                jnp.int32(TerminationType.INSUFFICIENT_ASSOCIATIONS),
                jnp.where(
                    converged,
                    jnp.int32(TerminationType.CONVERGED),
                    jnp.int32(TerminationType.MAX_ITER),
                ),
            )
            return ((est_q, est_t), i + 1, status, insufficient | converged)

        state0 = (
            (init_q, init_t),
            jnp.int32(0),
            jnp.int32(TerminationType.MAX_ITER),
            jnp.asarray(False),
        )
        (est, iters, status, _) = lax.while_loop(cond, body, state0)
        return est[0], est[1], status, iters

    rep = P()
    sh = P(axis)
    f = shard_map(
        impl,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, sh, sh, sh, sh, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_rep=False,
    )
    q, t, status, iters = f(
        source.edge_points,
        source.edge_mask,
        source.planar_points,
        source.planar_mask,
        target.edge_points,
        target.edge_mask,
        target.planar_points,
        target.planar_mask,
        target_T_source_init.rotation.astype(dtype),
        target_T_source_init.translation.astype(dtype),
    )
    return Pose3(q, t), status, iters


def sharded_map_insert(
    maps: VoxelMap,
    new_points: jax.Array,
    new_mask: jax.Array,
    mesh: Mesh,
    center: Optional[jax.Array] = None,
    keep_radius: float = 0.0,
    axis: str = "data",
) -> Tuple[VoxelMap, jax.Array]:
    """Insert replicated points into a device-sharded voxel map.

    ``maps`` leaves carry a leading device axis (D, C, ...) sharded over
    ``axis``. Voxel ownership = voxel key mod D, so dedup stays local and
    the union of shards equals the single-device map's content. Returns the
    updated sharded map and the total dropped-voxel count.
    """
    D = mesh.shape[axis]

    def impl(pts_l, mask_l, new_pts, new_mask, vox, orig):
        me = lax.axis_index(axis)
        local = VoxelMap(pts_l[0], mask_l[0], vox, orig)
        key = _voxel_key(local, new_pts, new_mask)
        own = (key % D) == me
        m, dropped = voxel_map_insert(
            local, new_pts, new_mask & own, center, keep_radius
        )
        return (
            m.points[None],
            m.mask[None],
            lax.psum(dropped, axis),
        )

    rep = P()
    sh = P(axis)
    f = shard_map(
        impl,
        mesh=mesh,
        in_specs=(sh, sh, rep, rep, rep, rep),
        out_specs=(sh, sh, rep),
        check_rep=False,
    )
    pts, mask, dropped = f(
        maps.points, maps.mask, new_points, new_mask, maps.voxel_size, maps.origin
    )
    return VoxelMap(pts, mask, maps.voxel_size, maps.origin), dropped


def sharded_map_empty(
    capacity_per_device: int,
    voxel_size: float,
    mesh: Mesh,
    origin=(0.0, 0.0, 0.0),
    dtype=jnp.float32,
    axis: str = "data",
) -> VoxelMap:
    """A (D, C, ...) voxel map placed sharded over the mesh."""
    D = mesh.shape[axis]
    base = voxel_map_empty(capacity_per_device, voxel_size, origin, dtype)
    spec = NamedSharding(mesh, P(axis))
    return VoxelMap(
        jax.device_put(jnp.broadcast_to(base.points, (D,) + base.points.shape), spec),
        jax.device_put(jnp.broadcast_to(base.mask, (D,) + base.mask.shape), spec),
        base.voxel_size,
        base.origin,
    )
