"""Cart-pole swing-up system (BASELINE.json config 5 stretch workload).

No reference counterpart (the reference ships pendulum/double-pendulum only);
standard cart-pole dynamics: state x = [p, θ, ṗ, θ̇] with θ measured from the
hanging-down position, control u = horizontal force on the cart.
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
    p = params
    mc, mp_, l, g = p["m_cart"], p["m_pole"], p["l"], p["g"]
    th, pd, thd = x[1], x[2], x[3]
    f = u[0]
    s, c = jnp.sin(th), jnp.cos(th)
    # Pole hanging below the cart at θ=0, point mass at distance l
    # (underactuated-robotics convention; upright θ=π is the unstable target):
    #   p̈ = [F + m s (g c + l θ̇²)] / (M + m s²)
    #   θ̈ = −[F c + m l θ̇² s c + (M+m) g s] / (l (M + m s²))
    denom = mc + mp_ * s**2
    pdd = (f + mp_ * s * (g * c + l * thd**2)) / denom
    thdd = -(f * c + mp_ * l * thd**2 * s * c + (mc + mp_) * g * s) / (l * denom)
    return jnp.stack([pd, thd, pdd, thdd])


def make_cartpole(
    dt: float,
    x_target,
    Q,
    R,
    Q_f,
    g: float = 9.81,
    m_cart: float = 1.0,
    m_pole: float = 0.2,
    l: float = 0.5,
    integrator: str = "rk4",
) -> System:
    params = quadratic_cost_params(x_target, Q, R, Q_f)
    params.update(
        g=jnp.asarray(g), m_cart=jnp.asarray(m_cart),
        m_pole=jnp.asarray(m_pole), l=jnp.asarray(l), dt=jnp.asarray(dt),
    )
    return System(
        params=params, n_x=4, n_u=1, dt=dt, f_cont=f_cont,
        stage_cost=quadratic_stage_cost, terminal_cost=quadratic_terminal_cost,
        integrator=integrator,
    )
