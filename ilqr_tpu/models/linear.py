"""Linear time-invariant systems and exact ZOH discretization.

Covers the reference's MATLAB-only linear capabilities: exact zero-order-hold
discretization via the augmented matrix exponential
(`/root/reference/matlab/functions/cont2disc.m:1-9`) and the
`Linear_iLQR_CLASS` one-shot LQR special case
(`/root/reference/matlab/CLASSES/Linear_iLQR_CLASS.m`) — the solver lives in
`ilqr_tpu.ops.lqr`; this module provides the system objects.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ilqr_tpu.models.base import (
    System,
    quadratic_cost_params,
    quadratic_stage_cost,
    quadratic_terminal_cost,
)


def cont2disc(A: jnp.ndarray, B: jnp.ndarray, dt: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ZOH discretization: expm([[A, B], [0, 0]]·dt) → (A_d, B_d)."""
    n, m = A.shape[0], B.shape[1]
    top = jnp.concatenate([A, B], axis=1)
    bot = jnp.zeros((m, n + m), dtype=top.dtype)
    E = jsl.expm(jnp.concatenate([top, bot], axis=0) * dt)
    return E[:n, :n], E[:n, n:]


def lti_f_cont(params, x, u):
    from ilqr_tpu.models.base import matvec

    return matvec(params["A"], x) + matvec(params["B"], u)


def make_discrete_lti(
    A_d,
    B_d,
    dt: float,
    x_target,
    Q,
    R,
    Q_f,
) -> System:
    """Discrete LTI system x⁺ = A_d x + B_d u (e.g. the exact-ZOH output of
    `cont2disc`) with quadratic tracking costs.

    Uses the 'discrete' integrator, so the solver consumes the exact
    discretization directly — the capability behind the reference's MATLAB
    linear driver (`main_.m`: cont2disc + Linear_iLQR_CLASS), which the
    continuous-only `make_lti` cannot express.
    """
    A_d, B_d = jnp.asarray(A_d), jnp.asarray(B_d)
    params = quadratic_cost_params(x_target, Q, R, Q_f)
    params.update(A=A_d, B=B_d, dt=jnp.asarray(dt))
    return System(
        params=params,
        n_x=A_d.shape[0],
        n_u=B_d.shape[1],
        dt=dt,
        f_cont=lti_f_cont,   # interpreted as the discrete map
        stage_cost=quadratic_stage_cost,
        terminal_cost=quadratic_terminal_cost,
        integrator="discrete",
    )


def make_lti(
    A,
    B,
    dt: float,
    x_target,
    Q,
    R,
    Q_f,
    integrator: str = "euler",
) -> System:
    """Continuous LTI system ẋ = Ax + Bu with quadratic tracking costs."""
    A, B = jnp.asarray(A), jnp.asarray(B)
    params = quadratic_cost_params(x_target, Q, R, Q_f)
    params.update(A=A, B=B, dt=jnp.asarray(dt))
    return System(
        params=params,
        n_x=A.shape[0],
        n_u=B.shape[1],
        dt=dt,
        f_cont=lti_f_cont,
        stage_cost=quadratic_stage_cost,
        terminal_cost=quadratic_terminal_cost,
        integrator=integrator,
    )
