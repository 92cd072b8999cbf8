"""Checkpoint/resume of solver state (SURVEY.md §5: absent in the reference;
optional capability for long batched runs).

Any pytree (an `IlqrSolution`, an `MpcResult`, a warm-start dict) round-trips
through a flat .npz plus the treedef reconstructed from a donor pytree of the
same structure.  Kept dependency-free (numpy only) — orbax is available in the
image but overkill for these small states.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _norm(path: str) -> str:
    # np.savez appends '.npz' to extensionless paths; keep load symmetric.
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree: Any) -> None:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    np.savez(_norm(path), **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path: str, like: Any) -> Any:
    """Load leaves saved by `save_pytree` into the structure of ``like``."""
    data = np.load(_norm(path))
    _, treedef = jax.tree_util.tree_flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if len(leaves) != treedef.num_leaves:
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, structure needs "
            f"{treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
