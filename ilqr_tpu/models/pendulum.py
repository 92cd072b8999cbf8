"""Single pendulum swing-up system.

Physics parity with the reference (`/root/reference/python/class_files/systems/
pendulum_sys.py:60-98`): state x = [θ, θ̇], control u = [τ],
θ̈ = τ − d·θ̇ − (g/l)·sin θ, dt-scaled quadratic stage cost, unscaled quadratic
terminal cost.
"""
from __future__ import annotations

import jax.numpy as jnp

from ilqr_tpu.models.base import (
    System,
    quadratic_cost_params,
    quadratic_stage_cost,
    quadratic_terminal_cost,
)


def f_cont(params, x, u):
    theta, theta_dot = x[0], x[1]
    return jnp.stack(
        [
            theta_dot,
            u[0] - params["d"] * theta_dot
            - (params["g"] / params["l"]) * jnp.sin(theta),
        ]
    )


def make_pendulum(
    dt: float,
    x_target,
    Q,
    R,
    Q_f,
    g: float = 9.81,
    l: float = 1.0,
    d: float = 0.01,
    integrator: str = "rk4",
) -> System:
    params = quadratic_cost_params(x_target, Q, R, Q_f)
    params.update(g=jnp.asarray(g), l=jnp.asarray(l), d=jnp.asarray(d), dt=jnp.asarray(dt))
    return System(
        params=params,
        n_x=2,
        n_u=1,
        dt=dt,
        f_cont=f_cont,
        stage_cost=quadratic_stage_cost,
        terminal_cost=quadratic_terminal_cost,
        integrator=integrator,
    )
