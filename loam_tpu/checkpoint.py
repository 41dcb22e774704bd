"""Checkpoint / resume for odometry and mapping state.

The reference library is stateless (SURVEY §5: all state lives in the
caller); the stateful layers this framework adds (scan-to-map voxel maps,
streaming odometry carry, trajectories) need persistence for long runs and
restarts. Any JAX pytree round-trips through a single ``.npz`` file: leaves
are stored under their tree-path names, and ``load`` rebuilds into the shape
of a template pytree (e.g. a freshly constructed ``scan_to_map_init()``
state), so NamedTuple / dataclass structure never needs to be pickled.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _leaf_names(tree: Any):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = []
    for path, _ in paths_and_leaves:
        names.append("/".join(str(jax.tree_util.keystr((k,))) for k in path))
    return names, [leaf for _, leaf in paths_and_leaves]


def save(path: str, state: Any) -> None:
    """Write a pytree of arrays to ``path`` (.npz, atomic rename)."""
    names, leaves = _leaf_names(state)
    arrays = {}
    for i, (name, leaf) in enumerate(zip(names, leaves)):
        arrays[f"{i:04d}|{name}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load(path: str, template: Any) -> Any:
    """Read a pytree checkpoint written by :func:`save`.

    ``template`` supplies the tree structure (and device placement targets);
    leaf values come from the file. Raises if the checkpoint's leaf count or
    names do not match the template (state-schema change).
    """
    names, leaves = _leaf_names(template)
    with np.load(path) as data:
        keys = sorted(data.files, key=lambda k: int(k.split("|", 1)[0]))
        if len(keys) != len(leaves):
            raise ValueError(
                f"checkpoint {path} has {len(keys)} leaves, "
                f"template has {len(leaves)}"
            )
        stored_names = [k.split("|", 1)[1] for k in keys]
        if stored_names != names:
            diff = [
                (a, b) for a, b in zip(stored_names, names) if a != b
            ][:3]
            raise ValueError(f"checkpoint/template leaf mismatch, e.g. {diff}")
        values = [data[k] for k in keys]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, values)
