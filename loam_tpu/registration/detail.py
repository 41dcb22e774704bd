"""Registration diagnostics: jit-compatible ``RegistrationDetail``.

The reference's one observability artifact (SURVEY §5) is
``RegistrationDetail`` (``registration.h:79-109``): per-iteration initial
pose, association lists, computed update, and a termination reason. Here it is
a fixed-shape pytree so it can flow out of ``jit``/``vmap``: association lists
become (max_iterations, capacity) index arrays with -1 padding, and the
termination reason is an int32 code (``params.TerminationType``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from ..geometry import Pose3


class IterationInfo(NamedTuple):
    """Stacked per-iteration diagnostics (leading axis = outer iteration).

    Mirrors reference ``RegistrationDetail::IterationInfo``
    (``registration.h:85-104``). Iterations at index >= ``num_iterations``
    (in the parent detail) did not run; their slots are unspecified.

    Attributes:
      target_T_source_init: Pose3 with (I, ...) leaves — estimate entering
        each iteration.
      estimate_update: Pose3 with (I, ...) leaves — the solved delta
        (identity for iterations that bailed before solving).
      edge_match: (I, E) int32 — for each source edge feature slot, the
        nearest associated target index, or -1 if unassociated. Equivalent to
        the reference's ``edge_associations`` pair list (src index implicit).
      plane_match: (I, Q) int32 — same for planar features.
      edge_count: (I,) int32 valid edge associations per iteration.
      plane_count: (I,) int32 valid plane associations per iteration.
      edge_knn_overflow: (I,) int32 — grid-backend cell-overflow count for
        the edge search (0 on exact backends). Nonzero means the voxel-hash
        search may have missed neighbors (``neighbors/grid.py`` "never
        silent" contract — the exactness analogue of the reference's exact
        KD-tree, ``kdtree.cpp:10-28``).
      plane_knn_overflow: (I,) int32 — same for the planar search.
    """

    target_T_source_init: Pose3
    estimate_update: Pose3
    edge_match: jax.Array
    plane_match: jax.Array
    edge_count: jax.Array
    plane_count: jax.Array
    edge_knn_overflow: jax.Array = None
    plane_knn_overflow: jax.Array = None


class RegistrationDetail(NamedTuple):
    """Fixed-shape analogue of reference ``RegistrationDetail``
    (``registration.h:79-109``).

    Attributes:
      iteration_info: stacked per-iteration records (leading axis
        ``max_iterations``; only the first ``num_iterations`` entries ran).
      termination: int32 code, see ``params.TerminationType``.
      num_iterations: int32 — number of outer iterations that actually
        executed (i.e. produced an IterationInfo record).
    """

    iteration_info: IterationInfo
    termination: jax.Array
    num_iterations: jax.Array
