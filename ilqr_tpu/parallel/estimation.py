"""Horizon-sharded parallel-in-time Kalman filtering and smoothing.

Distributed counterpart of `ilqr_tpu.estimation_parallel`: the associative
filter elements (Särkkä & García-Fernández 2021) use the SAME combine as the
parallel Riccati elements, so the block decomposition mirrors
`ilqr_tpu.parallel.horizon.backward_pass_sharded` — run the local
associative scan per chip, all-gather the per-block totals (payload
O(D·n_x²), independent of N), fold the boundary element per chip, close.
The filter is a PREFIX scan (boundary = blocks to the LEFT), the smoother a
SUFFIX scan (boundary = blocks to the RIGHT).

No reference counterpart at any level: the reference has no estimation and
no distribution (`SURVEY.md` §2, §5).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ilqr_tpu.estimation_parallel import (
    SmootherElement,
    _filter_elements,
    smoother_combine,
)
from ilqr_tpu.models.base import f32_matmuls
from ilqr_tpu.ops.parallel_riccati import combine


def _filter_block(axis_name, n_blocks, elems_blk):
    """Per-chip prefix-scan body (runs under shard_map)."""
    d = jax.lax.axis_index(axis_name)

    # 1. Local inclusive prefix scan (no communication).
    local = jax.lax.associative_scan(combine, elems_blk, axis=0)
    block_total = jax.tree_util.tree_map(lambda a: a[-1], local)

    # 2. One small all-gather of per-block totals.
    gathered = jax.lax.all_gather(block_total, axis_name)  # (D, …)

    # 3. Boundary: combined prefix of all blocks strictly to the LEFT,
    #    composed left-to-right (static masked loop; d is traced).
    n_x = elems_blk.b.shape[-1]
    left = None
    for j in range(n_blocks):
        blk_j = jax.tree_util.tree_map(lambda a: a[j], gathered)
        if left is None:
            ident = jax.tree_util.tree_map(jnp.zeros_like, blk_j)
            ident = ident._replace(A=jnp.eye(n_x, dtype=elems_blk.A.dtype))
            left = ident
        cand = combine(left, blk_j)
        left = jax.tree_util.tree_map(
            lambda c, l: jnp.where(j < d, c, l), cand, left
        )

    # 4. Close local prefixes against the boundary.
    return jax.vmap(combine, in_axes=(None, 0))(left, local)


@f32_matmuls
def kalman_filter_sharded(
    F, c, H, d, Q_proc, R_obs, m0, P0, Y, mesh: Mesh, axis: str = "time"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizon-sharded drop-in for
    `ilqr_tpu.estimation_parallel.kalman_filter_parallel`.

    N must be divisible by mesh.shape[axis].  Time-indexed model arrays and
    measurements shard along the time axis; the prior is replicated.
    """
    n_blocks = mesh.shape[axis]
    N = Y.shape[0]
    if N % n_blocks != 0:
        raise ValueError(f"N={N} not divisible by {n_blocks} shards")

    elems = _filter_elements(F, c, H, d, Q_proc, R_obs, m0, P0, Y)
    spec = jax.tree_util.tree_map(lambda _: P(axis), elems)
    fn = jax.shard_map(
        partial(_filter_block, axis, n_blocks),
        mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
    )
    prefix = fn(elems)
    Pout = 0.5 * (prefix.C + jnp.swapaxes(prefix.C, -1, -2))
    return prefix.b, Pout


def _smoother_block(axis_name, n_blocks, elems_blk):
    """Per-chip suffix-scan body (runs under shard_map)."""
    d = jax.lax.axis_index(axis_name)
    n_x = elems_blk.g.shape[-1]

    local = jax.lax.associative_scan(
        lambda a, b: smoother_combine(b, a), elems_blk, reverse=True, axis=0
    )
    block_total = jax.tree_util.tree_map(lambda a: a[0], local)
    gathered = jax.lax.all_gather(block_total, axis_name)

    # Boundary: blocks strictly to the RIGHT, composed right-to-left.
    right = SmootherElement(
        E=jnp.eye(n_x, dtype=elems_blk.E.dtype),
        g=jnp.zeros(n_x, elems_blk.g.dtype),
        L=jnp.zeros((n_x, n_x), elems_blk.L.dtype),
    )
    for j in range(n_blocks - 1, -1, -1):
        blk_j = jax.tree_util.tree_map(lambda a: a[j], gathered)
        cand = smoother_combine(blk_j, right)
        right = jax.tree_util.tree_map(
            lambda cd, r: jnp.where(j > d, cd, r), cand, right
        )

    return jax.vmap(smoother_combine, in_axes=(0, None))(local, right)


@f32_matmuls
def kalman_smoother_sharded(
    F, c, Q_proc, X_f, P_f, mesh: Mesh, axis: str = "time"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizon-sharded drop-in for
    `ilqr_tpu.estimation_parallel.kalman_smoother_parallel`.

    Conventions match the unsharded version (F[k] maps estimate k to k+1,
    the last filtered moment is its own smoothed moment); N = X_f.shape[0]
    must be divisible by mesh.shape[axis].
    """
    n_blocks = mesh.shape[axis]
    N = X_f.shape[0]
    if N % n_blocks != 0:
        raise ValueError(f"N={N} not divisible by {n_blocks} shards")

    from ilqr_tpu.ops.smallmat import solve_small

    def elem(mf, Pf, F_next, c_next):
        Pp = F_next @ Pf @ F_next.T + Q_proc
        E = solve_small(Pp, F_next @ Pf).T
        g = mf - E @ (F_next @ mf + c_next)
        L = Pf - E @ F_next @ Pf
        return SmootherElement(E=E, g=g, L=0.5 * (L + L.T))

    elems = jax.vmap(elem)(X_f[:-1], P_f[:-1], F, c)
    last = SmootherElement(E=jnp.zeros_like(P_f[-1]), g=X_f[-1], L=P_f[-1])
    elems = jax.tree_util.tree_map(
        lambda a, z: jnp.concatenate([a, z[None]], axis=0), elems, last)

    spec = jax.tree_util.tree_map(lambda _: P(axis), elems)
    fn = jax.shard_map(
        partial(_smoother_block, axis, n_blocks),
        mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
    )
    suffix = fn(elems)
    P_s = 0.5 * (suffix.L + jnp.swapaxes(suffix.L, -1, -2))
    return suffix.g, P_s
