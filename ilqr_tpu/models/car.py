"""Kinematic bicycle ("car") model.

No reference counterpart (the reference ships pendulum/double-pendulum only);
included as the standard ground-vehicle workload for the constrained solver —
obstacle avoidance as smooth quadratic stage inequalities
(`ilqr_tpu.constrained`, examples/car_obstacles.py).

State x = [p_x, p_y, heading θ, speed v]; control u = [acceleration a,
steering angle δ].  Kinematic bicycle with wheelbase L:

    ṗ_x = v cos θ,  ṗ_y = v sin θ,  θ̇ = (v / L) tan δ,  v̇ = a
"""
from __future__ import annotations

import jax.numpy as jnp

from ilqr_tpu.models.base import (
    System,
    quadratic_cost_params,
    quadratic_stage_cost,
    quadratic_terminal_cost,
)

from ilqr_tpu.constrained import ConstraintSet


def f_cont(params, x, u):
    th, v = x[2], x[3]
    a, delta = u[0], u[1]
    return jnp.stack([
        v * jnp.cos(th),
        v * jnp.sin(th),
        v / params["L"] * jnp.tan(delta),
        a,
    ])


def make_car(
    dt: float,
    x_target,
    Q,
    R,
    Q_f,
    L: float = 2.0,
    integrator: str = "rk4",
) -> System:
    params = quadratic_cost_params(x_target, Q, R, Q_f)
    params.update(L=jnp.asarray(L), dt=jnp.asarray(dt))
    return System(
        params=params, n_x=4, n_u=2, dt=dt, f_cont=f_cont,
        stage_cost=quadratic_stage_cost, terminal_cost=quadratic_terminal_cost,
        integrator=integrator,
    )


def _obstacle_g(params, x, u=None):
    # g_i = r_i² − ‖p − c_i‖² ≤ 0 — smooth (quadratic), violated inside the
    # disc.  Residuals are in m² units; scale radii accordingly in ctol.
    d = x[None, :2] - params["centers"]          # (n_obs, 2)
    return params["radii"] ** 2 - jnp.sum(d * d, axis=-1)


def obstacle_constraints(centers, radii) -> ConstraintSet:
    """Keep-out discs in the (p_x, p_y) plane as stage+terminal inequalities.

    centers: (n_obs, 2); radii: (n_obs,).  Use margin-inflated radii for
    safety distance; combine with control boxes via `merge_constraints`.
    """
    params = dict(centers=jnp.asarray(centers), radii=jnp.asarray(radii))
    return ConstraintSet(
        params=params,
        stage_ineq=_obstacle_g,
        terminal_ineq=lambda p, x: _obstacle_g(p, x),
    )
