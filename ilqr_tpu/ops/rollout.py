"""Forward rollouts: nominal, closed-loop, and batched line-search.

Semantics match the reference forward pass
(`/root/reference/python/class_files/iLQR_class.py:164-247`):
    u_k = u_old_k + α·u_ff_k + K_k (x_k − x_old_k)
    x_{k+1} = f(x_k, u_k),   cost += l(x_k, u_k),  + l_f(x_N) at the end.

TPU-native addition: `linesearch_rollouts` evaluates the *entire* α schedule
as one vmapped rollout batch instead of the reference's host-side backtracking
loop with a device sync per probe (`iLQR_class.py:281-301`).  Selecting the
first improving α from the batch reproduces the reference's
accept-first-improving semantics exactly (the schedule order is preserved)
while costing a single device program.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import System, f32_matmuls
from ilqr_tpu.ops.integrators import step

# Unrolling the sequential scans amortizes TPU per-step dispatch overhead
# (~15 µs/step unrolled=1 on v5e) across several physical steps; 16 keeps
# compile time modest while cutting rollout latency several-fold.  On CPU the
# overhead being amortized doesn't exist and unrolling only multiplies
# XLA:CPU compile time (catastrophically so for reverse-mode programs that
# differentiate through these scans — see ilqr_tpu.diff), so non-TPU
# backends scan with unroll=1.
SCAN_UNROLL = 16


def scan_unroll(tpu_value: int = SCAN_UNROLL) -> int:
    """Unroll factor for the sequential scans (TPU only).

    ILQR_TPU_SCAN_UNROLL overrides the default — compile time of large
    programs (e.g. a full MPC loop) grows with the unrolled body size, so
    latency-insensitive runs can trade a few % runtime for much faster
    compiles with a smaller factor."""
    import os

    if jax.default_backend() != "tpu":
        return 1
    env = os.environ.get("ILQR_TPU_SCAN_UNROLL")
    if env:
        return max(1, min(int(env), tpu_value))
    return tpu_value


@f32_matmuls
def rollout(system: System, x0: jnp.ndarray, U: jnp.ndarray):
    """Open-loop rollout of a control sequence. Returns X: (N+1, n_x), cost."""

    def body(carry, u):
        x, c = carry
        c = c + system.stage_cost(system.params, x, u)
        x1 = step(system, x, u)
        return (x1, c), x

    (x_N, cost), X_head = jax.lax.scan(body, (x0, 0.0), U, unroll=scan_unroll())
    cost = cost + system.terminal_cost(system.params, x_N)
    X = jnp.concatenate([X_head, x_N[None]], axis=0)
    return X, cost


@f32_matmuls
def closed_loop_rollout(
    system: System,
    x0: jnp.ndarray,
    alpha: jnp.ndarray,
    X_old: jnp.ndarray,
    U_old: jnp.ndarray,
    u_ff: jnp.ndarray,
    K: jnp.ndarray,
    u_limits=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-loop line-search rollout. Time-major: X_old (N+1,n_x), U_old (N,n_u),
    u_ff (N,n_u), K (N,n_u,n_x). Returns (X_new, U_new, cost).

    ``u_limits`` = (lo, hi) clips each applied control to hard box limits
    (control-limited iLQR — see ops/boxqp.py; no reference counterpart)."""

    def body(carry, inp):
        x, c = carry
        x_old, u_old, uff_k, K_k = inp
        u = u_old + alpha * uff_k + K_k @ (x - x_old)
        if u_limits is not None:
            u = jnp.clip(u, u_limits[0], u_limits[1])
        c = c + system.stage_cost(system.params, x, u)
        x1 = step(system, x, u)
        return (x1, c), (x, u)

    (x_N, cost), (X_head, U_new) = jax.lax.scan(
        body, (x0, 0.0), (X_old[:-1], U_old, u_ff, K), unroll=scan_unroll()
    )
    cost = cost + system.terminal_cost(system.params, x_N)
    X_new = jnp.concatenate([X_head, x_N[None]], axis=0)
    return X_new, U_new, cost


@f32_matmuls
def linesearch_rollouts(system, x0, alphas, X_old, U_old, u_ff, K,
                        u_limits=None):
    """Roll out every α in the schedule as one vmapped batch.

    Returns (X_cands, U_cands, costs) with a leading α axis.
    """
    return jax.vmap(
        lambda a: closed_loop_rollout(system, x0, a, X_old, U_old, u_ff, K,
                                      u_limits)
    )(alphas)
