"""Scan-to-map odometry against local voxel maps.

BASELINE config 3: registration targets are fixed-capacity voxel maps of
accumulated edge/planar features (``loam_tpu.map``) instead of just the
previous scan — the standard LOAM mapping refinement the reference leaves to
user code. Uses the grid neighbor-search backend (map targets are much larger
than a single scan's features), a constant-velocity motion prior (also as a
solver regularizer: ``prior_weight`` keeps degenerate viewpoints anchored to
the prediction), and distance/rotation keyframing for map insertion.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..features import FeatureSet, extract_features
from ..geometry import Pose3, quat_multiply, quat_conjugate
from ..map import VoxelMap, voxel_map_empty, voxel_map_insert
from ..params import FeatureExtractionParams, LidarParams, RegistrationParams
from ..registration import RegistrationDetail
from ..registration.icf import _register, _register_impl, spatial_sort_features
from ..dewarp import dewarp_scan


@dataclasses.dataclass(frozen=True)
class ScanToMapConfig:
    """Static configuration of the scan-to-map driver (hashable)."""

    #: Voxel edge length for the edge-feature map (m).
    edge_voxel_size: float = 0.2
    #: Voxel edge length for the planar-feature map (m).
    planar_voxel_size: float = 0.4
    #: Capacity (slots) of the edge map.
    edge_capacity: int = 1 << 15
    #: Capacity (slots) of the planar map.
    planar_capacity: int = 1 << 17
    #: Evict map points farther than this from the sensor (0 disables).
    keep_radius: float = 100.0
    #: Insert a keyframe when translation since the last one exceeds this (m).
    keyframe_dist: float = 0.5
    #: ... or when rotation since the last one exceeds this (rad).
    keyframe_angle: float = 0.1


class ScanToMapState(NamedTuple):
    """Carry for the scan-to-map loop (a pytree)."""

    edge_map: VoxelMap
    planar_map: VoxelMap
    world_T_current: Pose3
    prev_delta: Pose3
    world_T_keyframe: Pose3
    frames_since_insert: jax.Array  # int32; -1 means "no keyframe yet"
    #: kNN target-side prep arrays for the Pallas backend, rebuilt ONLY on
    #: keyframe inserts (the map is otherwise unchanged, so re-padding /
    #: transposing / boxing ~164k map slots every frame was pure waste):
    #: (tT_e, rot_e, rbox_e, tT_p, rot_p, rbox_p, *edge_window(4),
    #: *plane_window(4)) — the window tuples are the hoisted cold-seed
    #: candidates (``ops.knn_pallas.window_candidates``), cached since
    #: round 5 so the prep-cache path runs the SAME seed-bound machinery
    #: as the in-register path (the round-4 A/B compared cache-without-
    #: seeds against no-cache-with-seeds — confounded). () when the Pallas
    #: path is inactive (non-TPU backend / non-f32).
    knn_prep_cache: tuple = ()


def _use_prep_cache(dtype) -> bool:
    """Whether to carry rebuild-on-insert kNN prep arrays in the state.

    Default ON since round 5. History: the round-4 A/B measured the cache
    neutral-to-negative, but CONFOUNDED — its custom_knn hook bypassed the
    registration loop's seed-bound machinery, so it compared (prep savings
    − seed losses). Round 5 threads the seed windows + visit-gate bounds
    through custom_knn (the 3-element contract in ``_register_impl``) and
    caches the windows too; the fair interleaved A/B
    (scripts/s2m_prep_cache_ab.py, 64 frames, canary 10.7 ms) then reads
    median cache-on 377.6 vs cache-off 369.1 scans/s (+2.3%, winning 2/3
    rounds). LOAM_S2M_PREP_CACHE=0 disables for A/B; exactness is pinned by
    tests/test_odometry.py::test_scan_to_map_prep_cache_path_matches_uncached.
    """
    from ..ops.knn_pallas import pallas_supported

    return (
        os.environ.get("LOAM_S2M_PREP_CACHE", "1") == "1"
        and pallas_supported()
        and dtype == jnp.float32
    )


def _build_prep_cache(
    edge_map: VoxelMap,
    planar_map: VoxelMap,
    qe: Optional[int] = None,
    qp: Optional[int] = None,
) -> tuple:
    """kNN target prep arrays (+ cold-seed windows when the query-side
    capacities ``qe``/``qp`` are known) for the current maps. Rebuilt only
    on keyframe inserts."""
    from ..ops.knn_pallas import knn_prep, window_candidates

    e = knn_prep(edge_map.points, edge_map.mask)
    p = knn_prep(planar_map.points, planar_map.mask)
    base = (e.tT, e.rot, e.rbox, p.tT, p.rot, p.rbox)
    if qe is None or qp is None:
        return base
    ew = window_candidates(edge_map.points, edge_map.mask, qe)
    pw = window_candidates(planar_map.points, planar_map.mask, qp)
    return base + ew + pw


def scan_to_map_init(
    config: ScanToMapConfig = ScanToMapConfig(),
    origin=(0.0, 0.0, 0.0),
    dtype=jnp.float32,
    lidar: Optional[LidarParams] = None,
    feat_params: FeatureExtractionParams = FeatureExtractionParams(),
) -> ScanToMapState:
    """Initial mapping state. Pass ``lidar`` (+ ``feat_params``) to enable
    the rebuild-on-insert kNN prep cache (``_use_prep_cache``): the cached
    cold-seed windows must be sized to the scan-side feature capacities,
    and the fair round-5 A/B only measured the cache a win WITH the seed
    machinery — so without ``lidar`` the state carries NO cache and the
    registration uses the plain in-register path (identical results either
    way). This also keeps ``scan_to_map_init()`` checkpoint templates
    pytree-compatible with pre-cache checkpoints; see
    :func:`scan_to_map_strip_cache` for checkpointing cached states."""
    edge_map = voxel_map_empty(
        config.edge_capacity, config.edge_voxel_size, origin, dtype
    )
    planar_map = voxel_map_empty(
        config.planar_capacity, config.planar_voxel_size, origin, dtype
    )
    cache = ()
    if lidar is not None and _use_prep_cache(dtype):
        cache = _build_prep_cache(
            edge_map, planar_map,
            feat_params.edge_capacity(lidar),
            feat_params.planar_capacity(lidar),
        )
    return ScanToMapState(
        edge_map=edge_map,
        planar_map=planar_map,
        world_T_current=Pose3.identity(dtype),
        prev_delta=Pose3.identity(dtype),
        world_T_keyframe=Pose3.identity(dtype),
        frames_since_insert=jnp.int32(-1),
        knn_prep_cache=cache,
    )


def scan_to_map_strip_cache(state: ScanToMapState) -> ScanToMapState:
    """Return ``state`` with the kNN prep cache dropped.

    The cache is DERIVED state (rebuilt from the maps on any keyframe
    insert), so strip it before checkpointing: the stripped state loads
    into a plain ``scan_to_map_init()`` template regardless of whether the
    save side had the cache enabled. Resume either uncached (results are
    identical) or re-derive it with :func:`scan_to_map_rebuild_cache`."""
    return state._replace(knn_prep_cache=())


def scan_to_map_rebuild_cache(
    state: ScanToMapState,
    lidar: LidarParams,
    feat_params: FeatureExtractionParams = FeatureExtractionParams(),
) -> ScanToMapState:
    """Re-derive the kNN prep cache (+ seed windows) for ``state``'s maps —
    the inverse of :func:`scan_to_map_strip_cache` after a checkpoint load.
    No-op where the cache is inactive (non-TPU backend / non-f32)."""
    dtype = state.edge_map.points.dtype
    if not _use_prep_cache(dtype):
        return state._replace(knn_prep_cache=())
    return state._replace(
        knn_prep_cache=_build_prep_cache(
            state.edge_map, state.planar_map,
            feat_params.edge_capacity(lidar),
            feat_params.planar_capacity(lidar),
        )
    )


def _map_feature_set(edge_map: VoxelMap, planar_map: VoxelMap) -> FeatureSet:
    e = edge_map.points.shape[0]
    p = planar_map.points.shape[0]
    return FeatureSet(
        edge_points=edge_map.points,
        edge_mask=edge_map.mask,
        edge_indices=jnp.full((e,), -1, jnp.int32),
        planar_points=planar_map.points,
        planar_mask=planar_map.mask,
        planar_indices=jnp.full((p,), -1, jnp.int32),
    )


def default_map_reg_params() -> RegistrationParams:
    """Map-target registration defaults, picked for the backend at hand.

    On TPU the culled brute-force Pallas kernel beats the gather-bound voxel
    grid at every size tested (docs/PERFORMANCE.md), including map-capacity
    targets whose key-sorted storage is spatially coherent (the kernel's
    bounding-box chunk culling skips almost everything beyond the search
    radius). On CPU the voxel grid wins at map scale.
    """
    from ..ops.knn_pallas import pallas_supported

    backend = "bruteforce" if pallas_supported() else "grid"
    return RegistrationParams(search_backend=backend, prior_weight=300.0)


@functools.partial(
    jax.jit,
    static_argnames=("lidar", "feat_params", "reg_params", "config", "dewarp"),
)
def scan_to_map_step(
    state: ScanToMapState,
    scan: jax.Array,
    lidar: LidarParams,
    feat_params: FeatureExtractionParams = FeatureExtractionParams(),
    reg_params: Optional[RegistrationParams] = None,
    config: ScanToMapConfig = ScanToMapConfig(),
    dewarp: bool = False,
) -> Tuple[ScanToMapState, Pose3, RegistrationDetail]:
    """Process one scan against the map; returns (state, world pose, detail).

    Flow: [optional dewarp with the constant-velocity motion] -> extract ->
    register world-frame features against the voxel maps (init = constant-
    velocity prediction) -> keyframe-gated map insert.

    ``reg_params=None`` uses :func:`default_map_reg_params` (fast backend
    for the current hardware).
    """
    if dewarp:
        scan = dewarp_scan(scan, state.prev_delta, lidar)
    feats = spatial_sort_features(extract_features(scan, lidar, feat_params))
    return scan_to_map_step_features(
        state, feats, reg_params=reg_params, config=config
    )


@functools.partial(jax.jit, static_argnames=("reg_params", "config"))
def scan_to_map_step_features(
    state: ScanToMapState,
    feats: FeatureSet,
    reg_params: Optional[RegistrationParams] = None,
    config: ScanToMapConfig = ScanToMapConfig(),
) -> Tuple[ScanToMapState, Pose3, RegistrationDetail]:
    """:func:`scan_to_map_step` from pre-extracted (sorted) features.

    Extraction does not depend on the mapping state, so offline drivers
    batch it across all frames up front (one vmapped program, ~1 ms/scan
    amortized) and run only this map-dependent part in the sequential loop.
    ``feats`` should already be ordered for the kNN kernel's chunk culling
    (``spatial_sort_features``: Morton order, matching the voxel maps'
    Morton-key-sorted storage).
    """
    if reg_params is None:
        reg_params = default_map_reg_params()
    dtype = feats.edge_points.dtype

    init = state.world_T_current.compose(state.prev_delta)  # const-velocity
    target = _map_feature_set(state.edge_map, state.planar_map)
    # the source is pre-sorted (Morton); the voxel map's Morton-key-sorted
    # storage is spatially compact, so no reordering inside the registration
    custom_knn = None
    if (
        len(state.knn_prep_cache) == 14  # prep arrays AND seed windows:
        # a windowless cache would re-run the confounded round-4 arm
        # (prep savings minus seed losses, a measured regression)
        and reg_params.search_backend == "bruteforce"
        and reg_params.max_edge_neighbor_dist > 0
        and reg_params.max_plane_neighbor_dist > 0
        and _use_prep_cache(dtype)
        and os.environ.get("LOAM_DISABLE_PALLAS", "0") != "1"
    ):
        # Rebuild-on-insert kNN target prep: the search targets are the
        # voxel maps, which change ONLY on keyframe inserts — the carried
        # prep arrays make every non-keyframe frame skip the pad/transpose/
        # chunk-box work over the full map capacity that the in-register
        # path would redo (the reference builds its KD-trees per call on an
        # immutable target, registration-inl.h:20-23; here the prep is the
        # analogous build, hoisted across frames). Since round 5 the cache
        # also carries the cold-seed windows, and the custom callables
        # accept the per-iteration visit-gate bound — the exact seed-bound
        # machinery of the in-register path (fair-A/B fix, VERDICT r4
        # item 3).
        from ..ops.knn_pallas import TargetPrep, default_tt, knn_run

        cache = state.knn_prep_cache
        tT_e, rot_e, rbox_e, tT_p, rot_p, rbox_p = cache[:6]
        Me = state.edge_map.points.shape[0]
        Mp = state.planar_map.points.shape[0]
        e_prep = TargetPrep(tT_e, rot_e, rbox_e, Me, default_tt(Me))
        p_prep = TargetPrep(tT_p, rot_p, rbox_p, Mp, default_tt(Mp))
        seed_windows = (
            (tuple(cache[6:10]), tuple(cache[10:14]))
            if len(cache) == 14 else None
        )
        custom_knn = (
            lambda q, bound=None: (knn_run(
                e_prep, q, reg_params.num_edge_neighbors,
                reg_params.max_edge_neighbor_dist, with_coords=True,
                query_mask=feats.edge_mask, seed_bound=bound,
            ), None),
            lambda q, bound=None: (knn_run(
                p_prep, q, reg_params.num_plane_neighbors,
                reg_params.max_plane_neighbor_dist, with_coords=True,
                query_mask=feats.planar_mask, seed_bound=bound,
            ), None),
            seed_windows,
        )
    if custom_knn is not None:
        # closures cannot cross _register's jit boundary; this whole step
        # is already jitted, so call the unjitted body directly (the same
        # entry the distributed layer uses for its sharded-search hook)
        world_T_new, detail = _register_impl(
            feats, target, init, reg_params, with_matches=False,
            reorder_mode="none", custom_knn=custom_knn,
        )
    else:
        world_T_new, detail = _register(
            feats, target, init, reg_params, with_matches=False,
            reorder_mode="none",
        )
    # First frame (empty map): registration bails with the init pose; make
    # that the identity start rather than the (identity-composed) prior.
    first = state.frames_since_insert < 0
    world_T_new = jax.tree.map(
        lambda f, s: jnp.where(first, f, s),
        state.world_T_current,
        world_T_new,
    )

    # keyframe decision: motion since the last inserted keyframe
    rel_q = quat_multiply(
        quat_conjugate(state.world_T_keyframe.rotation), world_T_new.rotation
    )
    angle = 2.0 * jnp.arctan2(jnp.linalg.norm(rel_q[1:]), jnp.abs(rel_q[0]))
    dist = jnp.linalg.norm(
        world_T_new.translation - state.world_T_keyframe.translation
    )
    insert = first | (dist > config.keyframe_dist) | (angle > config.keyframe_angle)

    def do_insert(carry):
        edge_map, planar_map, _ = carry
        ew = world_T_new.act(feats.edge_points)
        pw = world_T_new.act(feats.planar_points)
        center = world_T_new.translation
        edge_map, _ = voxel_map_insert(
            edge_map, ew, feats.edge_mask, center, config.keep_radius
        )
        planar_map, _ = voxel_map_insert(
            planar_map, pw, feats.planar_mask, center, config.keep_radius
        )
        # the kNN prep arrays (+ seed windows) mirror the maps: rebuild
        # ONLY here; mirror the incoming cache's shape (with/without
        # windows) so the lax.cond branches stay pytree-consistent
        if state.knn_prep_cache:
            qe = qp = None
            if len(state.knn_prep_cache) == 14:
                qe = feats.edge_points.shape[0]
                qp = feats.planar_points.shape[0]
            cache = _build_prep_cache(edge_map, planar_map, qe, qp)
        else:
            cache = ()
        return edge_map, planar_map, cache

    edge_map, planar_map, prep_cache = lax.cond(
        insert, do_insert, lambda c: c,
        (state.edge_map, state.planar_map, state.knn_prep_cache),
    )

    prev_delta = state.world_T_current.inverse().compose(world_T_new).normalize()
    new_state = ScanToMapState(
        edge_map=edge_map,
        planar_map=planar_map,
        world_T_current=world_T_new.normalize(),
        prev_delta=prev_delta,
        world_T_keyframe=jax.tree.map(
            lambda k, n: jnp.where(insert, n, k), state.world_T_keyframe, world_T_new
        ),
        frames_since_insert=jnp.where(
            insert, 0, jnp.maximum(state.frames_since_insert, 0) + 1
        ).astype(jnp.int32),
        knn_prep_cache=prep_cache,
    )
    return new_state, world_T_new, detail


@functools.partial(
    jax.jit,
    static_argnames=(
        "lidar", "feat_params", "reg_params", "config", "dewarp",
        "hoist_extraction",
    ),
)
def scan_to_map_offline(
    scans: jax.Array,
    lidar: LidarParams,
    feat_params: FeatureExtractionParams = FeatureExtractionParams(),
    reg_params: Optional[RegistrationParams] = None,
    config: ScanToMapConfig = ScanToMapConfig(),
    dewarp: bool = False,
    init_state: Optional[ScanToMapState] = None,
    hoist_extraction: bool = True,
) -> Tuple[ScanToMapState, Pose3, RegistrationDetail]:
    """Whole-trajectory scan-to-map odometry in ONE compiled program.

    ``lax.scan`` drives :func:`scan_to_map_step` over the stacked frames —
    the mapping loop is inherently sequential (each frame registers against
    the map built so far), but running it on-device amortizes dispatch
    latency (~30 ms/call on remote-attached chips) to one dispatch per
    TRAJECTORY instead of per frame, and the compiled program size is one
    step regardless of F.

    Args:
      scans: (F, L, P, 3) or (F, L*P, 3) stacked scans.

    Returns: (final state, trajectory Pose3 with (F, ...) leaves, stacked
    per-frame RegistrationDetail).
    """
    if reg_params is None:
        reg_params = default_map_reg_params()
    state0 = (
        scan_to_map_init(config, lidar=lidar, feat_params=feat_params)
        if init_state is None else init_state
    )

    if dewarp or not hoist_extraction:
        # In-loop extraction. Dewarping needs per-frame motion state, so it
        # always extracts here. For the non-dewarp case the default is the
        # hoisted path below: it measured ~8% slower early in round 2 (the
        # batched feature pytree round-trips through HBM), but after the
        # NMS windowing + packed-kNN optimizations the sequential loop is
        # fast enough that batching extraction wins decisively
        # (204.6 -> 267.9 scans/s at 32 frames on v5e).
        def step(state, scan):
            state, pose, detail = scan_to_map_step(
                state, scan, lidar, feat_params, reg_params, config, dewarp
            )
            return state, (pose, detail)

        state, (traj, details) = lax.scan(step, state0, scans)
        return state, traj, details

    # Opt-in: batch extraction over ALL frames up front, leaving only the
    # map-dependent registration + insert in the sequential scan.
    from ..features import extract_features_batch

    feats_all = extract_features_batch(
        scans, lidar, feat_params, post=spatial_sort_features
    )

    def step_feats(state, feats):
        state, pose, detail = scan_to_map_step_features(
            state, feats, reg_params, config
        )
        return state, (pose, detail)

    state, (traj, details) = lax.scan(step_feats, state0, feats_all)
    return state, traj, details
