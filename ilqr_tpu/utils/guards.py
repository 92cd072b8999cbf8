"""Numerical guards (SURVEY.md §5 "race detection / sanitizers" role).

JAX's functional purity makes the scans race-free by construction; the
numerical failure mode that remains is NaN/Inf from indefinite Q_uu solves or
diverging rollouts.  The solver already guards its accept step
(`solver.py`: finite costs + finite gains required) and reports
LINESEARCH_FAILED instead of propagating garbage; these helpers add explicit
checking at API boundaries for debugging.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def finite_leaves(tree: Any) -> jnp.ndarray:
    """Scalar bool: every array leaf in the pytree is finite."""
    leaves = [
        jnp.all(jnp.isfinite(l))
        for l in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


def assert_finite(tree: Any, name: str = "pytree") -> None:
    """Host-side check (blocks): raise if any leaf contains NaN/Inf."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(np.isfinite(arr)):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


def solve_checked(system, x0, U_init, config):
    """`ilqr_tpu.solve` + host-side finiteness validation of the solution.

    For interactive debugging — the plain `solve` never blocks the device.
    """
    from ilqr_tpu.solver import solve

    sol = solve(system, x0, U_init, config)
    assert_finite((sol.X, sol.U, sol.cost), "IlqrSolution")
    return sol
