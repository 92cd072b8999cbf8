"""Pallas TPU kernels for sequential closed-loop rollouts.

The forward rollout is inherently sequential in time, and under XLA each scan
step costs ~10-15 µs of per-step overhead on TPU (dozens of separate tiny VPU
ops with inter-op synchronization) — at N=100k that is ~1.4 s, dwarfing the
31 ms parallel-scan backward pass.  Compiling the *whole* rollout into one
Mosaic kernel turns each step into straight-line VLIW code.

Design:
* grid over time chunks; the (x, cost) carry lives in VMEM scratch and
  persists across sequential grid steps (standard TPU pipeline pattern), so
  inputs stream HBM→VMEM chunk-by-chunk with automatic double buffering;
* all line-search α candidates advance together as rows of an (A_pad, n_x)
  state block — `linesearch_costs_pallas` returns every candidate cost from
  ONE sequential pass and stores no trajectories (O(A) memory at any N);
* the accepted α's trajectory is then materialized by a second kernel
  (`closed_loop_rollout_pallas`) — two fast chains instead of one slow one;
* the model's `step`/`stage_cost` functions are traced directly into the
  kernel via `jax.vmap` over the α axis — any model whose dynamics trace to
  Mosaic-supported ops works unmodified.

The feedback term u = u_old + α·u_ff + K(x − x_old) is unrolled as scalar
row algebra (no in-kernel reshapes of K).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import System
from ilqr_tpu.ops.integrators import step

# Mosaic compile time grows superlinearly with the in-kernel loop bound; 64
# compiles in seconds and runtime is insensitive to the split.
CHUNK = 64


def _a_pad(n_alpha: int) -> int:
    """α-axis padded to a sublane multiple (8)."""
    return max(-(-n_alpha // 8) * 8, 8)


def _flatten_params(params):
    """Params pytree → list of 2D arrays (kernel inputs) + reassembly info.

    Pallas kernels cannot capture traced constants; every model parameter
    rides in as a small replicated VMEM ref instead.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    arrs, shapes = [], []
    for l in leaves:
        a = jnp.asarray(l)
        shapes.append(a.shape)
        if a.ndim == 0:
            a = a.reshape(1, 1)
        elif a.ndim == 1:
            a = a.reshape(1, -1)
        arrs.append(a)
    return arrs, tuple(shapes), treedef


def _read_params(refs, shapes, treedef):
    leaves = []
    for r, s in zip(refs, shapes):
        v = r[:]
        if len(s) == 0:
            v = v[0, 0]
        elif len(s) == 1:
            v = v[0, :]
        leaves.append(v)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _feedback_controls(x3, X_row, U_row, F_row, K_row, al, n_x, n_u):
    """u[a] = u_old + α_a·u_ff + K (x[a] − x_old), unrolled over tiny dims.

    x3: (A, 1, n_x); rows: (1, ·); al: (A, 1).  Every intermediate stays
    rank ≥ 2 — Mosaic's layout assignment aborts on rank-1 values.
    """
    u_cols = []
    for i in range(n_u):
        acc = U_row[0, i] + al * F_row[0, i]  # (A, 1)
        for j in range(n_x):
            acc = acc + K_row[0, i * n_x + j] * (x3[:, :, j] - X_row[0, j])
        u_cols.append(acc[:, :, None])
    return jnp.concatenate(u_cols, axis=2)  # (A, 1, n_u)


def _ls_cost_kernel(sys_static, shapes, treedef, n_chunks, N, n_x, n_u,
                    *refs):
    import jax.experimental.pallas as pl

    n_p = len(shapes)
    (x0_ref, al_ref, Xo_ref, Uo_ref, F_ref, K_ref) = refs[n_p:n_p + 6]
    out_ref, x_sc, c_sc = refs[n_p + 6:]
    system = sys_static.replace(params=_read_params(refs[:n_p], shapes, treedef))
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        x_sc[:] = jnp.broadcast_to(x0_ref[0:1, :][:, None, :], x_sc.shape)
        c_sc[:] = jnp.zeros_like(c_sc)

    # Double-vmap keeps every model intermediate at rank ≥ 2 in Mosaic.
    step_v = jax.vmap(jax.vmap(lambda xx, uu: step(system, xx, uu)))
    cost_v = jax.vmap(jax.vmap(
        lambda xx, uu: system.stage_cost(system.params, xx, uu)))
    al = al_ref[:, 0:1]

    def body(t, carry):
        x, cost = carry  # x: (A, 1, n_x), cost: (A, 1)
        u = _feedback_controls(x, Xo_ref[pl.ds(t, 1), :], Uo_ref[pl.ds(t, 1), :],
                               F_ref[pl.ds(t, 1), :], K_ref[pl.ds(t, 1), :],
                               al, n_x, n_u)
        valid = (c * CHUNK + t) < N
        cost_new = cost + jnp.where(valid, cost_v(x, u), 0.0)
        x_new = jnp.where(valid, step_v(x, u), x)
        return x_new, cost_new

    x, cost = jax.lax.fori_loop(0, CHUNK, body, (x_sc[:], c_sc[:]))
    x_sc[:] = x
    c_sc[:] = cost

    term_v = jax.vmap(jax.vmap(
        lambda xx: system.terminal_cost(system.params, xx)))
    out_ref[:] = cost + term_v(x)


def _traj_kernel(sys_static, shapes, treedef, n_chunks, N, n_x, n_u,
                 *refs):
    import jax.experimental.pallas as pl

    n_p = len(shapes)
    (x0_ref, al_ref, Xo_ref, Uo_ref, F_ref, K_ref) = refs[n_p:n_p + 6]
    X_out, U_out, fin_ref, x_sc, c_sc = refs[n_p + 6:]
    system = sys_static.replace(params=_read_params(refs[:n_p], shapes, treedef))
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        x_sc[:] = jnp.broadcast_to(x0_ref[0:1, :][:, None, :], x_sc.shape)
        c_sc[:] = jnp.zeros_like(c_sc)

    # Double-vmap keeps every model intermediate at rank ≥ 2 in Mosaic.
    step_v = jax.vmap(jax.vmap(lambda xx, uu: step(system, xx, uu)))
    cost_v = jax.vmap(jax.vmap(
        lambda xx, uu: system.stage_cost(system.params, xx, uu)))
    al = al_ref[:, 0:1]

    def body(t, carry):
        x, cost = carry  # x: (A, 1, n_x), cost: (A, 1)
        u = _feedback_controls(x, Xo_ref[pl.ds(t, 1), :], Uo_ref[pl.ds(t, 1), :],
                               F_ref[pl.ds(t, 1), :], K_ref[pl.ds(t, 1), :],
                               al, n_x, n_u)
        X_out[pl.ds(t, 1), :] = x[0, :, :]
        U_out[pl.ds(t, 1), :] = u[0, :, :]
        valid = (c * CHUNK + t) < N
        cost_new = cost + jnp.where(valid, cost_v(x, u), 0.0)
        x_new = jnp.where(valid, step_v(x, u), x)
        return x_new, cost_new

    x, cost = jax.lax.fori_loop(0, CHUNK, body, (x_sc[:], c_sc[:]))
    x_sc[:] = x
    c_sc[:] = cost

    term_v = jax.vmap(jax.vmap(
        lambda xx: system.terminal_cost(system.params, xx)))
    total = cost + term_v(x)
    fin_ref[0:1, :n_x] = x[0, :, :]
    fin_ref[0:1, n_x:] = total[0:1, :]


def _pad_time(a, n_pad):
    pad = n_pad - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )


def _common_inputs(system, x0, alphas, X_old, U_old, u_ff, K):
    N = U_old.shape[0]
    n_x, n_u = system.n_x, system.n_u
    n_pad = max(-(-N // CHUNK) * CHUNK, CHUNK)
    A = alphas.shape[0]
    a_pad = _a_pad(A)
    al = jnp.zeros((a_pad, 1), X_old.dtype).at[:A, 0].set(alphas)
    Xo = _pad_time(X_old[:N], n_pad)
    Uo = _pad_time(U_old, n_pad)
    F = _pad_time(u_ff, n_pad)
    Kf = _pad_time(K.reshape(N, n_u * n_x), n_pad)
    return N, n_x, n_u, n_pad, a_pad, al, Xo, Uo, F, Kf


def linesearch_costs_pallas(
    system: System, x0, alphas, X_old, U_old, u_ff, K,
    interpret: bool | None = None
):
    """Candidate costs for every α from one sequential in-kernel pass."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ilqr_tpu.ops.pallas_riccati import _resolve_interpret

    interpret = _resolve_interpret(interpret)

    N, n_x, n_u, n_pad, a_pad, al, Xo, Uo, F, Kf = _common_inputs(
        system, x0, alphas, X_old, U_old, u_ff, K
    )
    n_chunks = n_pad // CHUNK
    p_arrs, shapes, treedef = _flatten_params(system.params)
    sys_static = system.replace(params=None)
    kern = functools.partial(_ls_cost_kernel, sys_static, shapes, treedef,
                             n_chunks, N, n_x, n_u)
    blk = lambda w: pl.BlockSpec((CHUNK, w), lambda c: (c, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda c: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        out_shape=jax.ShapeDtypeStruct((a_pad, 1), X_old.dtype),
        in_specs=[rep(a.shape) for a in p_arrs]
        + [rep((1, n_x)), rep((a_pad, 1)), blk(n_x), blk(n_u),
           blk(n_u), blk(n_u * n_x)],
        out_specs=rep((a_pad, 1)),
        scratch_shapes=[
            pltpu.VMEM((a_pad, 1, n_x), X_old.dtype),
            pltpu.VMEM((a_pad, 1), X_old.dtype),
        ],
        interpret=interpret,
    )(*p_arrs, x0[None, :], al, Xo, Uo, F, Kf)
    return out[: alphas.shape[0], 0]


def closed_loop_rollout_pallas(
    system: System, x0, alpha, X_old, U_old, u_ff, K,
    interpret: bool | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Materialize the rollout for one α. Same contract as
    `ilqr_tpu.ops.rollout.closed_loop_rollout`."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ilqr_tpu.ops.pallas_riccati import _resolve_interpret

    interpret = _resolve_interpret(interpret)

    alphas = jnp.broadcast_to(jnp.asarray(alpha)[None], (1,))
    N, n_x, n_u, n_pad, a_pad, al, Xo, Uo, F, Kf = _common_inputs(
        system, x0, alphas, X_old, U_old, u_ff, K
    )
    n_chunks = n_pad // CHUNK
    p_arrs, shapes, treedef = _flatten_params(system.params)
    sys_static = system.replace(params=None)
    kern = functools.partial(_traj_kernel, sys_static, shapes, treedef,
                             n_chunks, N, n_x, n_u)
    blk = lambda w: pl.BlockSpec((CHUNK, w), lambda c: (c, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda c: (0, 0),
                                     memory_space=pltpu.VMEM)
    X_head, U_new, fin = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_x), X_old.dtype),
            jax.ShapeDtypeStruct((n_pad, n_u), X_old.dtype),
            jax.ShapeDtypeStruct((1, n_x + 1), X_old.dtype),
        ),
        in_specs=[rep(a.shape) for a in p_arrs]
        + [rep((1, n_x)), rep((a_pad, 1)), blk(n_x), blk(n_u),
           blk(n_u), blk(n_u * n_x)],
        out_specs=(blk(n_x), blk(n_u), rep((1, n_x + 1))),
        scratch_shapes=[
            pltpu.VMEM((a_pad, 1, n_x), X_old.dtype),
            pltpu.VMEM((a_pad, 1), X_old.dtype),
        ],
        interpret=interpret,
    )(*p_arrs, x0[None, :], al, Xo, Uo, F, Kf)
    x_N = fin[0, :n_x]
    cost = fin[0, n_x]
    X_new = jnp.concatenate([X_head[:N], x_N[None]], axis=0)
    return X_new, U_new[:N], cost
