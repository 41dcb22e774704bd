"""Iterative Closest Feature: the outer registration loop.

TPU-native equivalent of reference ``registerFeatures``
(``registration-inl.h:11-78``): up to ``max_iterations`` rounds of
(re-)association + delta-pose solve + left-composition, with the reference's
exact termination semantics:

  * ``INSUFFICIENT_ASSOCIATIONS`` bails *before* solving — the returned pose
    is the estimate entering that iteration, and the iteration records no
    diagnostics (SURVEY §2.3(9)).
  * Convergence is checked *after* the update is applied, so a converged run
    includes its final small update (SURVEY §2.3(10)).
  * The update composes on the left: ``est = delta o est``
    (``registration-inl.h:65``).

The loop is a ``lax.while_loop`` (iterations stop as soon as termination
fires — no wasted device work) and is vmappable over a pair axis for batched
multi-pair registration (the batched loop runs until every pair terminates,
with per-pair masking).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..debug import tap_finite
from ..features.types import FeatureSet
from ..geometry import Pose3, quat_multiply, quat_normalize, quat_rotate
from ..neighbors import build_grid, knn_grid
from ..params import RegistrationParams, TerminationType
from .associate import associate_edges, associate_planes
from .detail import IterationInfo, RegistrationDetail
from .solver import _Problem, lm_solve


class _LoopState(NamedTuple):
    est: Pose3
    i: jax.Array  # current outer iteration index
    status: jax.Array  # int32 TerminationType code
    done: jax.Array  # bool
    detail: IterationInfo  # stacked (max_iterations, ...) slots
    # warm-start carry for the Pallas kNN gate: previous iteration's packed
    # neighbor coordinates+mask per class ((xs, ys, zs, mask) x 2), or ()
    # on search paths without seed support. Bounds recomputed from these at
    # the CURRENT pose each iteration prune chunk visits exactly (see
    # ops/knn_pallas.py::knn_run seed_bound).
    seed: tuple = ()


def _angle_from_identity(q: jax.Array) -> jax.Array:
    """Rotation angle of a unit quaternion (Eigen ``angularDistance`` to I)."""
    return 2.0 * jnp.arctan2(jnp.linalg.norm(q[..., 1:], axis=-1), jnp.abs(q[..., 0]))


def _stable_sort_1d(operands, num_keys: int):
    """Stable multi-operand 1-D sort via ``lax.sort(is_stable=True)``.

    (A VMEM bitonic-kernel alternative existed through round 3 but never
    lowered on the v5e runtime and measured no faster as an XLA network;
    pruned in round 4 — ``ops/bitonic.py`` keeps only the network form.)
    """
    return lax.sort(tuple(operands), num_keys=num_keys, is_stable=True)


def _sort_features_multikey(fs: FeatureSet, e_key: jax.Array, p_key: jax.Array) -> FeatureSet:
    """Reorder both feature classes by per-slot sort keys with ONE
    multi-operand stable sort per class (``_stable_sort_1d``).

    Coordinates, mask, and indices ride along as sort operands — the
    argsort + per-leaf gather form costs 4 TPU gathers per class (~7 ms/run
    at 16-frame batch scale in device traces); carried operands cost ~one
    sort. Stability = argsort-identical tie order (original slot order).
    """

    def s(points, mask, idxs, key):
        _, x, y, z, m, ix = _stable_sort_1d(
            (key, points[:, 0], points[:, 1], points[:, 2],
             mask.astype(jnp.int32), idxs),
            num_keys=1,
        )
        return jnp.stack([x, y, z], axis=-1), m.astype(bool), ix

    ep, em, ei = s(fs.edge_points, fs.edge_mask, fs.edge_indices, e_key)
    pp, pm, pi = s(fs.planar_points, fs.planar_mask, fs.planar_indices, p_key)
    return FeatureSet(ep, em, ei, pp, pm, pi)


def azimuth_sort_features(fs: FeatureSet) -> FeatureSet:
    """Return ``fs`` with edge/planar slots azimuth-sorted.

    Sorting once per frame (instead of 4 argsorts per pair inside
    ``_register``) lets odometry drivers register pre-sorted sets with
    ``reorder_mode="none"`` — the Pallas kNN chunk culling still sees
    narrow (~10 deg) coherent wedges, at half the sorting cost. Feature-set
    semantics are order-invariant; only slot numbering changes (a sorted
    set's ``*_indices`` still map slots to scan points).
    """

    def key(points, mask):
        az = jnp.arctan2(points[:, 1], points[:, 0])
        return jnp.where(mask, az, jnp.asarray(1e9, az.dtype))

    return _sort_features_multikey(
        fs,
        key(fs.edge_points, fs.edge_mask),
        key(fs.planar_points, fs.planar_mask),
    )


def spatial_sort_features(fs: FeatureSet, cell_size: float = 1.0) -> FeatureSet:
    """Return ``fs`` with edge/planar slots Morton-sorted (sensor frame).

    Morton (Z-order) sorting makes every contiguous block of slots a compact
    3-D blob, so the Pallas kNN kernel's per-tile query bounding boxes stay
    small against ANY target — in particular the voxel map, whose key-sorted
    storage is itself Morton-ordered. Rigid motion preserves compactness, so
    sorting in the sensor frame works regardless of the world pose. (Azimuth
    sorting, the right choice when BOTH sides are single scans, produces
    radially long wedges whose boxes span the full range.)
    """
    from ..ops.morton import morton_key

    def key(points, mask):
        return jnp.where(
            mask,
            morton_key(points, cell_size),
            jnp.iinfo(jnp.int32).max,
        )

    return _sort_features_multikey(
        fs,
        key(fs.edge_points, fs.edge_mask),
        key(fs.planar_points, fs.planar_mask),
    )


def _hoist_knn_prep(target: FeatureSet) -> bool:
    """Whether to build kNN target prep explicitly above the ICF loop.

    The hoisted path also enables the kernel's packed neighbor-coordinate
    outputs (no per-iteration gather). Measured on v5e (scripts/hoist_ab.py,
    one process): +5% at scan scale before coords, +42% with coords; at map
    scale (164k target slots) plain hoisting was ~4% slower than XLA's own
    in-body code motion, but with coords it is neutral today and avoids a
    gather that scales with map density — so the default is always-on.
    ``LOAM_ICF_HOIST_KNN=0`` forces the in-body XLA path for sweeps.
    """
    env = os.environ.get("LOAM_ICF_HOIST_KNN")
    if env is not None:
        return env == "1"
    return True


def _azimuth_sort_with_perms(fs: FeatureSet):
    """Azimuth-sort ``fs`` and return the applied permutations too.

    Feature slots come in (line, sector, rank) order, so any contiguous tile
    of them spans the full 360 deg sweep — which defeats the Pallas kNN
    kernel's bounding-box chunk culling. Azimuth-sorting both sides makes
    query tiles and target chunks cover narrow wedges, letting the kernel
    skip almost all chunks (exact: culled chunks are beyond the radius
    filter). Sets/fits are permutation-invariant; only kNN *tie* resolution
    can differ, which set-level semantics allow.

    The ``reorder_mode="auto"`` path needs the permutations to map detail
    match indices back to caller slot order; carrying an iota through the
    same multi-operand stable sort yields them for free (identical order to
    ``jnp.argsort`` of the key — same key, same stability)."""

    def s(points, mask, idxs):
        az = jnp.arctan2(points[:, 1], points[:, 0])
        key = jnp.where(mask, az, jnp.asarray(1e9, az.dtype))
        iota = jnp.arange(points.shape[0], dtype=jnp.int32)
        _, x, y, z, m, ix, perm = _stable_sort_1d(
            (key, points[:, 0], points[:, 1], points[:, 2],
             mask.astype(jnp.int32), idxs, iota),
            num_keys=1,
        )
        return jnp.stack([x, y, z], axis=-1), m.astype(bool), ix, perm

    ep, em, ei, se = s(fs.edge_points, fs.edge_mask, fs.edge_indices)
    pp, pm, pi, sp = s(fs.planar_points, fs.planar_mask, fs.planar_indices)
    return FeatureSet(ep, em, ei, pp, pm, pi), se, sp


def _permute_features(fs: FeatureSet, e_perm: jax.Array, p_perm: jax.Array) -> FeatureSet:
    return FeatureSet(
        edge_points=fs.edge_points[e_perm],
        edge_mask=fs.edge_mask[e_perm],
        edge_indices=fs.edge_indices[e_perm],
        planar_points=fs.planar_points[p_perm],
        planar_mask=fs.planar_mask[p_perm],
        planar_indices=fs.planar_indices[p_perm],
    )


@functools.partial(
    jax.jit, static_argnames=("params", "with_matches", "reorder_mode")
)
def _register(
    source: FeatureSet,
    target: FeatureSet,
    init: Pose3,
    params: RegistrationParams,
    with_matches: bool,
    source_perms=None,
    target_perms=None,
    reorder_mode: str = "auto",
) -> Tuple[Pose3, RegistrationDetail]:
    return _register_impl(
        source, target, init, params, with_matches, source_perms,
        target_perms, reorder_mode,
    )


def _register_impl(
    source: FeatureSet,
    target: FeatureSet,
    init: Pose3,
    params: RegistrationParams,
    with_matches: bool,
    source_perms=None,
    target_perms=None,
    reorder_mode: str = "auto",
    custom_knn=None,
) -> Tuple[Pose3, RegistrationDetail]:
    """Unjitted registration body.

    ``custom_knn``: optional ``(edge_fn, plane_fn)`` or ``(edge_fn,
    plane_fn, seed_windows)`` where each callable maps transformed query
    points ``(Q, 3)`` to ``(KnnResult, neighbor_pts)`` — the hook the
    distributed layer uses to swap in the sharded-target search
    (``parallel.distributed``) and the scan-to-map driver uses for its
    rebuild-on-insert prep cache, while keeping the full loop + detail
    machinery. With the 3-element form, ``seed_windows`` is the
    ``(edge, plane)`` pair of hoisted :func:`ops.knn_pallas.
    window_candidates` tuples, the callables must additionally accept
    ``bound=`` (a per-query squared-distance visit gate, forwarded as
    ``knn_run(..., seed_bound=...)``), and must return packed coordinate
    results (``with_coords=True``) so the warm-start carry can feed the
    next iteration's bound — i.e. the custom search runs with the SAME
    seed-bound machinery as the in-register Pallas path (round-5 fair-A/B
    requirement, VERDICT r4 item 3).
    """
    dtype = source.edge_points.dtype
    E = source.edge_points.shape[0]
    Q = source.planar_points.shape[0]
    I = params.max_iterations
    Em = E if with_matches else 0
    Qm = Q if with_matches else 0

    # Azimuth-coherent ordering of both feature sets when the Pallas kNN
    # path is active, so its bounding-box chunk culling fires. Exactness is
    # unaffected; detail match indices are mapped back below.
    # ``reorder_mode``: "auto" = dynamic azimuth argsort (any feature set);
    # "given" = caller supplies static permutations (e.g. sector_major_perms
    # for extractor output — zero sorting cost; a None side is left as-is,
    # the right call for voxel-map targets whose key-sorted storage is
    # already spatially coherent); "none" = keep order.
    from ..ops.knn_pallas import pallas_supported

    pallas_active = (
        pallas_supported()
        and dtype == jnp.float32
        and params.search_backend == "bruteforce"
        and params.max_edge_neighbor_dist > 0
        and params.max_plane_neighbor_dist > 0
        and os.environ.get("LOAM_DISABLE_PALLAS", "0") != "1"
    )
    reorder = pallas_active and reorder_mode != "none"
    reorder_src = reorder and not (reorder_mode == "given" and source_perms is None)
    reorder_tgt = reorder and not (reorder_mode == "given" and target_perms is None)
    if reorder_src:
        if reorder_mode == "given":
            se, sp = source_perms
            source = _permute_features(source, se, sp)
        else:
            source, se, sp = _azimuth_sort_with_perms(source)
    if reorder_tgt:
        if reorder_mode == "given":
            te, tp = target_perms
            target = _permute_features(target, te, tp)
        else:
            target, te, tp = _azimuth_sort_with_perms(target)

    detail0 = IterationInfo(
        target_T_source_init=Pose3.identity(dtype, (I,)),
        estimate_update=Pose3.identity(dtype, (I,)),
        edge_match=jnp.full((I, Em), -1, jnp.int32),
        plane_match=jnp.full((I, Qm), -1, jnp.int32),
        edge_count=jnp.zeros((I,), jnp.int32),
        plane_count=jnp.zeros((I,), jnp.int32),
        edge_knn_overflow=jnp.zeros((I,), jnp.int32),
        plane_knn_overflow=jnp.zeros((I,), jnp.int32),
    )
    state0 = _LoopState(
        est=Pose3(init.rotation.astype(dtype), init.translation.astype(dtype)),
        i=jnp.int32(0),
        status=jnp.int32(TerminationType.MAX_ITER),
        done=jnp.asarray(False),
        detail=detail0,
    )

    # The target is fixed across outer iterations, so acceleration structures
    # build ONCE here (the reference builds its KD-trees once too,
    # ``registration-inl.h:20-23``). The grid backend is exact up to
    # ``grid_max_per_cell`` voxel occupancy and turns each per-iteration
    # search into two binary searches + one gather per (query, cell).
    use_grid = (
        custom_knn is None
        and params.search_backend == "grid"
        and params.max_edge_neighbor_dist > 0
        and params.max_plane_neighbor_dist > 0
    )
    seed_windows = None
    if custom_knn is not None:
        edge_knn, plane_knn = custom_knn[0], custom_knn[1]
        if (
            len(custom_knn) > 2
            and custom_knn[2] is not None
            and os.environ.get("LOAM_KNN_SEED", "1") != "0"
        ):
            seed_windows = custom_knn[2]
    elif use_grid:
        edge_grid = build_grid(
            target.edge_points, target.edge_mask, params.max_edge_neighbor_dist
        )
        plane_grid = build_grid(
            target.planar_points, target.planar_mask, params.max_plane_neighbor_dist
        )

        def edge_knn(q):
            # overflow (cells over grid_max_per_cell occupancy) is threaded
            # into the per-iteration detail — the grid backend's truncation
            # signal must never be silently discarded (its docstring
            # contract; the reference's KD-tree is exact, kdtree.cpp:10-28)
            res, ovf = knn_grid(
                edge_grid,
                q,
                params.num_edge_neighbors,
                params.max_edge_neighbor_dist,
                params.grid_max_per_cell,
            )
            return res, None, ovf

        def plane_knn(q):
            res, ovf = knn_grid(
                plane_grid,
                q,
                params.num_plane_neighbors,
                params.max_plane_neighbor_dist,
                params.grid_max_per_cell,
            )
            return res, None, ovf

    elif pallas_active and _hoist_knn_prep(target):
        # Target-side kernel prep (pad/transpose/chunk bboxes) hoisted above
        # the while_loop — the targets are fixed across outer iterations
        # (the reference builds its KD-trees once, ``registration-inl.h:20-23``).
        from ..ops.knn_pallas import knn_prep, knn_run

        e_prep = knn_prep(target.edge_points, target.edge_mask)
        p_prep = knn_prep(target.planar_points, target.planar_mask)

        def edge_knn(q, bound=None):
            # with_coords: the kernel hands back neighbor coordinates in
            # packed layout — association fits run gather- and
            # transpose-free (associate.py PackedKnn fast path).
            # query_mask: invalid source slots (most of the edge capacity)
            # stop generating kernel visits; association masks them anyway.
            return knn_run(
                e_prep, q, params.num_edge_neighbors,
                params.max_edge_neighbor_dist, with_coords=True,
                query_mask=source.edge_mask, seed_bound=bound,
            ), None

        def plane_knn(q, bound=None):
            return knn_run(
                p_prep, q, params.num_plane_neighbors,
                params.max_plane_neighbor_dist, with_coords=True,
                query_mask=source.planar_mask, seed_bound=bound,
            ), None

        # Seed-bound machinery: slot-aligned cold candidates (hoisted) +
        # a warm-start carry of the previous iteration's neighbors. Both
        # only tighten the kernel's visit gate — outputs are exactly those
        # of the unseeded search. LOAM_KNN_SEED=0 disables for A/B.
        if os.environ.get("LOAM_KNN_SEED", "1") != "0":
            from ..ops.knn_pallas import window_candidates

            seed_windows = (
                window_candidates(target.edge_points, target.edge_mask, E),
                window_candidates(target.planar_points, target.planar_mask, Q),
            )

    else:
        edge_knn = plane_knn = None

    # Optional fused path: both searches in ONE Pallas launch per iteration
    # (the reference issues two KD-tree queries per iteration,
    # ``registration-inl.h:28-41``). Measured on v5e: NEUTRAL at
    # scan-to-scan scale and ~8% SLOWER at map scale (149 -> 137 scans/s;
    # the merged grid loses more than the saved launch), so it stays off
    # unless LOAM_ICF_DUAL_KNN=1. Kept because the break-even moves with
    # hardware generation and launch overhead.
    dual_knn = None
    if (
        pallas_active
        and custom_knn is None
        and not use_grid
        and os.environ.get("LOAM_ICF_DUAL_KNN", "0") == "1"
    ):
        from ..ops.knn_pallas import knn_dual_prep, knn_dual_run

        # target-side prep (pad/concat, chunk bboxes) hoisted above the
        # while_loop — targets are fixed across outer iterations, like the
        # reference's build-once KD-trees (``registration-inl.h:20-23``)
        dual_prep = knn_dual_prep(
            target.edge_points,
            target.edge_mask,
            target.planar_points,
            target.planar_mask,
        )

        def dual_knn(qe, qp):
            return knn_dual_run(
                dual_prep,
                qe,
                qp,
                params.num_edge_neighbors,
                params.num_plane_neighbors,
                params.max_edge_neighbor_dist,
                params.max_plane_neighbor_dist,
            )

    use_seed = seed_windows is not None and dual_knn is None
    if not use_seed:
        seed_windows = None
    if use_seed:
        kE = params.num_edge_neighbors
        kP = params.num_plane_neighbors
        state0 = state0._replace(
            seed=(
                jnp.zeros((kE, E), dtype), jnp.zeros((kE, E), dtype),
                jnp.zeros((kE, E), dtype), jnp.zeros((kE, E), bool),
                jnp.zeros((kP, Q), dtype), jnp.zeros((kP, Q), dtype),
                jnp.zeros((kP, Q), dtype), jnp.zeros((kP, Q), bool),
            )
        )

    def cond(state: _LoopState):
        return (state.i < I) & ~state.done

    def _call_knn(fn, q, bound=None):
        """Normalize knn closures: (res, nbr) or (res, nbr, overflow)."""
        if fn is None:
            return None, None, jnp.int32(0)
        out = fn(q, bound) if bound is not None else fn(q)
        if len(out) == 3:
            return out[0], out[1], out[2].astype(jnp.int32)
        return out[0], out[1], jnp.int32(0)

    def body(state: _LoopState) -> _LoopState:
        est = state.est
        qe = est.act(source.edge_points)
        qp = est.act(source.planar_points)
        new_seed = state.seed
        if dual_knn is not None:
            e_res, p_res = dual_knn(qe, qp)
            e_nbr = p_nbr = None
            e_ovf = p_ovf = jnp.int32(0)
        elif use_seed:
            # kNN visit-gate bounds: min(warm start from last iteration's
            # neighbors at the CURRENT pose, slot-aligned cold candidates).
            # Pure pruning — kernel outputs equal the unseeded search.
            from ..ops.knn_pallas import (
                seed_bound_from_packed, seed_bound_from_window,
            )

            exs, eys, ezs, em, pxs, pys, pzs, pm = state.seed
            ew, pw = seed_windows
            eb = jnp.minimum(
                seed_bound_from_packed(qe, exs, eys, ezs, em),
                seed_bound_from_window(qe, *ew, params.num_edge_neighbors),
            )
            pb = jnp.minimum(
                seed_bound_from_packed(qp, pxs, pys, pzs, pm),
                seed_bound_from_window(qp, *pw, params.num_plane_neighbors),
            )
            e_res, e_nbr, e_ovf = _call_knn(edge_knn, qe, eb)
            p_res, p_nbr, p_ovf = _call_knn(plane_knn, qp, pb)
            new_seed = (
                e_res.xs, e_res.ys, e_res.zs, e_res.mask,
                p_res.xs, p_res.ys, p_res.zs, p_res.mask,
            )
        else:
            e_res, e_nbr, e_ovf = _call_knn(edge_knn, qe)
            p_res, p_nbr, p_ovf = _call_knn(plane_knn, qp)
        ea = associate_edges(
            qe,
            source.edge_mask,
            target.edge_points,
            target.edge_mask,
            params,
            knn_result=e_res,
            neighbor_pts=e_nbr,
        )
        pa = associate_planes(
            qp,
            source.planar_mask,
            target.planar_points,
            target.planar_mask,
            params,
            knn_result=p_res,
            neighbor_pts=p_nbr,
        )
        n_edge = jnp.sum(ea.valid, dtype=jnp.int32)
        n_plane = jnp.sum(pa.valid, dtype=jnp.int32)
        insufficient = (n_edge + n_plane) < params.min_associations

        prior_offset = est.compose(
            Pose3(init.rotation.astype(dtype), init.translation.astype(dtype)).inverse()
        )
        problem = _Problem(
            pts_edge=qe, edge=ea, pts_plane=qp, plane=pa,
            prior_offset=prior_offset,
        )
        delta, _ = lax.cond(
            insufficient,
            lambda p: (Pose3.identity(dtype), jnp.asarray(0.0, dtype)),
            lambda p: lm_solve(p, params),
            problem,
        )

        new_est = Pose3(
            quat_normalize(quat_multiply(delta.rotation, est.rotation)),
            quat_rotate(delta.rotation, est.translation) + delta.translation,
        )
        # LOAM_DEBUG_NANS=1 stages per-iteration poisoning checks into the
        # loop (no-op otherwise); see loam_tpu/debug.py.
        tap_finite(
            {"delta": delta, "est": new_est, "lines": ea.line_a,
             "planes": pa.normal},
            where="icf.iteration",
        )
        angle = _angle_from_identity(delta.rotation)
        shift = jnp.linalg.norm(delta.translation, axis=-1)
        converged = (angle < params.rotation_convergence_thresh) & (
            shift < params.position_convergence_thresh
        )

        est_out = jax.tree.map(
            lambda n, o: jnp.where(insufficient, o, n), new_est, est
        )
        status = jnp.where(
            insufficient,
            jnp.int32(TerminationType.INSUFFICIENT_ASSOCIATIONS),
            jnp.where(
                converged,
                jnp.int32(TerminationType.CONVERGED),
                jnp.int32(TerminationType.MAX_ITER),
            ),
        )

        # Record diagnostics (reference records after the solve; an
        # insufficient iteration writes nothing, ``registration-inl.h:45-48``).
        # Row writes use iota-compare + where instead of scatters: batched
        # .at[].set ops cost ~100 us EACH on TPU (see features/extract.py) —
        # six per iteration added real time to the lockstep loop.
        row = jnp.where(insufficient, I, state.i)  # I -> dropped
        rows = jnp.arange(I, dtype=row.dtype)
        hit = rows == row  # (I,)

        def put(buf, val):
            # buf (I, ...) <- val (...) at position `row` (no-op when row==I)
            h = hit.reshape((I,) + (1,) * (buf.ndim - 1))
            return jnp.where(h, val[None], buf)

        d = state.detail
        detail = IterationInfo(
            target_T_source_init=Pose3(
                put(d.target_T_source_init.rotation, est.rotation),
                put(d.target_T_source_init.translation, est.translation),
            ),
            estimate_update=Pose3(
                put(d.estimate_update.rotation, delta.rotation),
                put(d.estimate_update.translation, delta.translation),
            ),
            edge_match=put(d.edge_match, ea.match[:Em]),
            plane_match=put(d.plane_match, pa.match[:Qm]),
            edge_count=jnp.where(hit, n_edge, d.edge_count),
            plane_count=jnp.where(hit, n_plane, d.plane_count),
            edge_knn_overflow=jnp.where(hit, e_ovf, d.edge_knn_overflow),
            plane_knn_overflow=jnp.where(hit, p_ovf, d.plane_knn_overflow),
        )

        return _LoopState(
            est=est_out,
            i=state.i + 1,
            status=status,
            done=insufficient | converged,
            detail=detail,
            seed=new_seed,
        )

    final = lax.while_loop(cond, body, state0)
    # iterations that ran AND recorded: insufficient terminal one is excluded
    insufficient_end = final.status == TerminationType.INSUFFICIENT_ASSOCIATIONS
    n_rec = jnp.where(insufficient_end, final.i - 1, final.i)
    info = final.detail
    if (reorder_src or reorder_tgt) and with_matches:
        # map match arrays back to the caller's slot order: permuted source
        # row i holds original slot s_perm[i]; a permuted target value v
        # denotes original slot t_perm[v].
        def remap(match, s_perm, t_perm):
            vals = match
            if t_perm is not None:
                vals = jnp.where(match >= 0, t_perm[jnp.maximum(match, 0)], -1)
            if s_perm is None:
                return vals
            return jnp.full_like(match, -1).at[:, s_perm].set(vals)

        info = info._replace(
            edge_match=remap(
                info.edge_match,
                se if reorder_src else None,
                te if reorder_tgt else None,
            ),
            plane_match=remap(
                info.plane_match,
                sp if reorder_src else None,
                tp if reorder_tgt else None,
            ),
        )
    detail = RegistrationDetail(
        iteration_info=info,
        termination=final.status,
        num_iterations=n_rec.astype(jnp.int32),
    )
    return final.est, detail


def register_features(
    source: FeatureSet,
    target: FeatureSet,
    target_T_source_init: Optional[Pose3] = None,
    params: RegistrationParams = RegistrationParams(),
    with_matches: bool = True,
) -> Tuple[Pose3, RegistrationDetail]:
    """Register a source feature set to a target feature set.

    TPU-native analogue of reference ``registerFeatures``
    (``registration.h:128-131``): returns the refined ``target_T_source``
    pose and always-on fixed-shape diagnostics (the reference's optional
    ``RegistrationDetail``).

    Args:
      source / target: padded FeatureSets (from ``extract_features`` or
        ``feature_set_from_points``).
      target_T_source_init: initial guess (identity when None).
      params: RegistrationParams (static; part of the jit cache key).
      with_matches: include per-iteration (capacity,)-sized association index
        arrays in the detail (static). Disable for large batched runs.
    """
    if target_T_source_init is None:
        target_T_source_init = Pose3.identity(source.edge_points.dtype)
    return _register(source, target, target_T_source_init, params, with_matches)


def register_features_batch(
    source: FeatureSet,
    target: FeatureSet,
    target_T_source_init: Pose3,
    params: RegistrationParams = RegistrationParams(),
    with_matches: bool = False,
) -> Tuple[Pose3, RegistrationDetail]:
    """Batched multi-pair registration: all leaves carry a leading pair axis.

    The reference processes pairs serially in user code (``README.md:44-60``);
    here one ``vmap`` solves the whole batch in lockstep on one chip (the
    batched while-loop runs until every pair terminates; finished pairs are
    masked). Detail matches are off by default to bound memory.
    """
    return jax.vmap(
        lambda s, t, i: _register(s, t, i, params, with_matches)
    )(source, target, target_T_source_init)
