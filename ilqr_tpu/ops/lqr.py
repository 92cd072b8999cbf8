"""One-shot finite-horizon discrete LQR (the exactly-linear special case).

Capability parity with `/root/reference/matlab/CLASSES/Linear_iLQR_CLASS.m`:
for x⁺ = A x + B u with quadratic costs the Riccati recursion is exact, so the
solve is a fixed backward→forward sequence — no iteration, no line search
(`Linear_iLQR_CLASS.m:135-139`).  Also doubles as the analytic test oracle for
the iLQR backward passes (an iLQR on a linear system must converge in one
step to this solution).

Tracking form: cost Σ ½(x−x*)'Q(x−x*) + ½u'Ru + terminal ½(x−x*)'Q_f(x−x*).
Handled by expanding around x* → affine value function carried as (S, s).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import f32_matmuls
from ilqr_tpu.ops.smallmat import solve_small


class LqrSolution(NamedTuple):
    X: jnp.ndarray      # (N+1, n_x)
    U: jnp.ndarray      # (N, n_u)
    K: jnp.ndarray      # (N, n_u, n_x) feedback gains
    k_ff: jnp.ndarray   # (N, n_u) feedforward terms
    cost: jnp.ndarray   # scalar


@f32_matmuls
def lqr_backward(A, B, Q, R, Q_f, x_target=None, N: int | None = None):
    """Backward Riccati recursion for time-invariant (A, B, Q, R).

    Returns stacked gains (K, k_ff) and value matrices (S, s) over the horizon.
    u_k = -K_k x_k - k_ff_k.
    """
    n_x = A.shape[0]
    if x_target is None:
        x_target = jnp.zeros((n_x,), dtype=A.dtype)
    q = -(Q @ x_target)
    q_f = -(Q_f @ x_target)

    def body(carry, _):
        # V_k(x) = ½ x'S x + s'x; Q-fn blocks: H = R + B'SB, G = B'SA,
        # q_u = B's; minimizing u = −Kx − k_ff gives
        # S⁻ = Q + A'S(A − BK), s⁻ = q + A's − G'k_ff.
        S, s = carry
        BtS = B.T @ S
        H = R + BtS @ B
        G = BtS @ A
        g = B.T @ s
        sol = solve_small(H, jnp.concatenate([G, g[:, None]], axis=1))
        K, k_ff = sol[:, :-1], sol[:, -1]
        S_new = Q + A.T @ S @ (A - B @ K)
        S_new = 0.5 * (S_new + S_new.T)
        s_new = q + A.T @ s - G.T @ k_ff
        return (S_new, s_new), (K, k_ff, S, s)

    init = (Q_f, q_f)
    (_, _), (K, k_ff, S, s) = jax.lax.scan(body, init, None, length=N, reverse=True)
    return K, k_ff, S, s


@f32_matmuls
def lqr_solve(A, B, Q, R, Q_f, x0, N: int, x_target=None) -> LqrSolution:
    """Solve the finite-horizon LQR and roll out the optimal policy."""
    n_x = A.shape[0]
    if x_target is None:
        x_target = jnp.zeros((n_x,), dtype=A.dtype)
    K, k_ff, _, _ = lqr_backward(A, B, Q, R, Q_f, x_target, N)

    def body(x, inp):
        K_k, k_k = inp
        u = -K_k @ x - k_k
        dx = x - x_target
        c = 0.5 * (dx @ Q @ dx + u @ R @ u)
        x1 = A @ x + B @ u
        return x1, (x, u, c)

    x_N, (X_head, U, cs) = jax.lax.scan(body, x0, (K, k_ff))
    dxN = x_N - x_target
    cost = jnp.sum(cs) + 0.5 * dxN @ Q_f @ dxN
    X = jnp.concatenate([X_head, x_N[None]], axis=0)
    return LqrSolution(X=X, U=U, K=K, k_ff=k_ff, cost=cost)
