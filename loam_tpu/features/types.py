"""Feature containers: fixed-capacity, masked, jit-friendly.

The reference returns variable-length ``std::vector`` feature lists
(``features.h:68-76``). Static XLA shapes require fixed capacity + masks:
capacity is ``scan_lines * number_sectors * (max_*_feats_per_sector + 1)``
(the ``+1`` honors the reference's off-by-one admission, SURVEY §2.3(3)).

Slot order is (scan line, sector, curvature rank) which is exactly the
reference's output ordering, so compacting a ``FeatureSet`` reproduces the
reference's feature vectors element for element.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FeatureSet(NamedTuple):
    """Padded LOAM feature sets (edge + planar), a JAX pytree.

    Attributes:
      edge_points:    (E, 3) edge feature positions (zeros in invalid slots).
      edge_mask:      (E,) slot validity.
      edge_indices:   (E,) flat scan index of each feature, -1 when invalid.
                      (-1 also for features not originating from a scan, e.g.
                      map points.)
      planar_points:  (Q, 3), planar_mask: (Q,), planar_indices: (Q,):
                      same for planar features.
    """

    edge_points: jax.Array
    edge_mask: jax.Array
    edge_indices: jax.Array
    planar_points: jax.Array
    planar_mask: jax.Array
    planar_indices: jax.Array

    @property
    def num_edge(self) -> jax.Array:
        return jnp.sum(self.edge_mask.astype(jnp.int32), axis=-1)

    @property
    def num_planar(self) -> jax.Array:
        return jnp.sum(self.planar_mask.astype(jnp.int32), axis=-1)

    def compact(self) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side: return dense (n_edge, 3), (n_planar, 3) arrays in the
        reference's output order. Not jittable."""
        em = np.asarray(self.edge_mask)
        pm = np.asarray(self.planar_mask)
        return (
            np.asarray(self.edge_points)[em],
            np.asarray(self.planar_points)[pm],
        )

    def compact_indices(self) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side: dense flat scan indices of selected features."""
        em = np.asarray(self.edge_mask)
        pm = np.asarray(self.planar_mask)
        return (
            np.asarray(self.edge_indices)[em],
            np.asarray(self.planar_indices)[pm],
        )


def feature_set_from_points(
    edge_points,
    planar_points,
    edge_capacity: int | None = None,
    planar_capacity: int | None = None,
    dtype=None,
) -> FeatureSet:
    """Build a FeatureSet from dense (n,3) arrays (e.g. synthetic scenes or
    map contents), padding to the requested capacities."""
    edge_points = jnp.asarray(edge_points, dtype=dtype)
    planar_points = jnp.asarray(planar_points, dtype=dtype)
    ne = edge_points.shape[0]
    np_ = planar_points.shape[0]
    ecap = ne if edge_capacity is None else edge_capacity
    pcap = np_ if planar_capacity is None else planar_capacity
    if ecap < ne or pcap < np_:
        raise ValueError("capacity smaller than provided points")
    dt = edge_points.dtype
    ep = jnp.zeros((ecap, 3), dt).at[:ne].set(edge_points)
    pp = jnp.zeros((pcap, 3), dt).at[:np_].set(planar_points)
    em = jnp.arange(ecap) < ne
    pm = jnp.arange(pcap) < np_
    return FeatureSet(
        edge_points=ep,
        edge_mask=em,
        edge_indices=jnp.where(em, jnp.arange(ecap), -1).astype(jnp.int32),
        planar_points=pp,
        planar_mask=pm,
        planar_indices=jnp.where(pm, jnp.arange(pcap), -1).astype(jnp.int32),
    )
