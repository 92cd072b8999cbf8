"""Planar quadrotor (BASELINE.json config 5 stretch workload).

No reference counterpart.  State x = [px, pz, φ, ṗx, ṗz, φ̇] (position,
roll angle, velocities), controls u = [F1, F2] (rotor thrusts at ±arm-length).
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
    m, g, arm, inertia = p["m"], p["g"], p["arm"], p["inertia"]
    phi = x[2]
    vx, vz, phid = x[3], x[4], x[5]
    thrust = u[0] + u[1]
    torque = arm * (u[1] - u[0])
    ax = -thrust * jnp.sin(phi) / m
    az = thrust * jnp.cos(phi) / m - g
    aphi = torque / inertia
    return jnp.stack([vx, vz, phid, ax, az, aphi])


def hover_controls(params) -> jnp.ndarray:
    """Per-rotor thrust that cancels gravity — useful as U_init."""
    return 0.5 * params["m"] * params["g"] * jnp.ones(2)


def make_quadrotor(
    dt: float,
    x_target,
    Q,
    R,
    Q_f,
    g: float = 9.81,
    m: float = 0.5,
    arm: float = 0.25,
    inertia: float = 0.01,
    integrator: str = "rk4",
) -> System:
    params = quadratic_cost_params(x_target, Q, R, Q_f)
    params.update(
        g=jnp.asarray(g), m=jnp.asarray(m), arm=jnp.asarray(arm),
        inertia=jnp.asarray(inertia), dt=jnp.asarray(dt),
    )
    return System(
        params=params, n_x=6, n_u=2, dt=dt, f_cont=f_cont,
        stage_cost=quadratic_stage_cost, terminal_cost=quadratic_terminal_cost,
        integrator=integrator,
    )
