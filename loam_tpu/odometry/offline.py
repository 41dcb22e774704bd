"""Batched offline odometry: the TPU-parallel form of the odometry loop.

The reference's loop is inherently serial (``README.md:44-60``). On TPU the
whole trajectory parallelizes (BASELINE config 4):

  1. feature extraction ``vmap``-ed over all frames at once,
  2. every consecutive (source, target) pair registered in one batched
     lockstep solve (``register_features_batch``),
  3. relative poses composed into world poses with
     ``lax.associative_scan`` — log-depth on device, not a host loop.

This is also the multi-chip unit of work: shard the frame axis over a mesh
and steps 1-2 are embarrassingly parallel (see ``loam_tpu.parallel``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..features import extract_features
from ..geometry import Pose3, pose_cumcompose
from ..params import FeatureExtractionParams, LidarParams, RegistrationParams
from ..registration import RegistrationDetail
from ..registration.icf import _register, azimuth_sort_features


@functools.partial(
    jax.jit, static_argnames=("lidar", "feat_params", "reg_params")
)
def odometry_offline(
    scans: jax.Array,
    lidar: LidarParams,
    feat_params: FeatureExtractionParams = FeatureExtractionParams(),
    reg_params: RegistrationParams = RegistrationParams(),
) -> Tuple[Pose3, RegistrationDetail]:
    """Whole-trajectory scan-to-scan odometry in one compiled program.

    Args:
      scans: (F, L, P, 3) or (F, L*P, 3) stacked scans.

    Returns:
      (trajectory, details): ``trajectory`` is a Pose3 with (F, ...) leaves —
      ``world_T_frame_i`` with frame 0 at identity; ``details`` stacks the
      per-pair RegistrationDetail for the F-1 registrations.
    """
    F = scans.shape[0]
    feats = jax.vmap(lambda s: extract_features(s, lidar, feat_params))(scans)
    # azimuth-sort each frame ONCE (it serves as both source and target of
    # consecutive pairs) so the kNN chunk culling sees coherent wedges
    # without any per-pair sorting inside the registration loop
    feats = jax.vmap(azimuth_sort_features)(feats)
    dtype = feats.edge_points.dtype

    src = jax.tree.map(lambda x: x[1:], feats)
    tgt = jax.tree.map(lambda x: x[:-1], feats)
    init = Pose3.identity(dtype, (F - 1,))
    rel, details = jax.vmap(
        lambda s, t, i: _register(
            s, t, i, reg_params, with_matches=False, reorder_mode="none"
        )
    )(src, tgt, init)
    # rel[i] = frame_i_T_frame_{i+1}; prefix-compose into world poses
    world = pose_cumcompose(rel)
    trajectory = Pose3(
        jnp.concatenate(
            [Pose3.identity(dtype, (1,)).rotation, world.rotation]
        ),
        jnp.concatenate(
            [Pose3.identity(dtype, (1,)).translation, world.translation]
        ),
    )
    return trajectory, details
