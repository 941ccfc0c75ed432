"""Checkpoint / resume / replay: the world is one pytree of arrays.

SURVEY.md §5.4: starframe has no confirmed save system; here snapshots are
first-class and exact (dtype/shape round-trip via ``np.savez``), used by the
golden-replay determinism tests (SURVEY.md §4.3, BASELINE.json:11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .state import World


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.name if hasattr(p, "name") else str(getattr(p, "idx", p)) for p in path
        )
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path: str, world: World) -> None:
    """Write an exact world snapshot to ``path`` (.npz)."""
    arrays, _ = _flatten_with_paths(world)
    np.savez(path, **arrays)


def load(path: str, like: World) -> World:
    """Load a snapshot; ``like`` provides the pytree structure (capacities
    must match the saved arrays)."""
    data = np.load(path)
    arrays, treedef = _flatten_with_paths(like)
    leaves = []
    flat, _ = jax.tree_util.tree_flatten_with_path(like)
    for path_keys, leaf in flat:
        key = "/".join(
            p.name if hasattr(p, "name") else str(getattr(p, "idx", p)) for p in path_keys
        )
        saved = data[key]
        if saved.shape != leaf.shape or saved.dtype != np.asarray(leaf).dtype:
            raise ValueError(f"snapshot field {key}: shape/dtype mismatch "
                             f"({saved.shape}/{saved.dtype} vs {leaf.shape}/{np.asarray(leaf).dtype})")
        leaves.append(jnp.asarray(saved))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), leaves)


def save_trajectory(path: str, traj) -> None:
    """Save a recorded rollout trajectory (pytree of stacked arrays)."""
    flat, _ = jax.tree_util.tree_flatten(traj)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_trajectory(path: str, like):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(like)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
