"""Control-rate (Δu) penalties via exact discrete state augmentation.

Smooth-control synthesis: penalize u_k − u_{k−1} so the solver produces
actuator-friendly commands.  No reference counterpart (the reference's costs
touch only x and u, `pendulum_sys.py:77-98`).

Mechanism: augment the state with the previous control, ``z = [x; u_prev]``,
under the DISCRETE map ``z⁺ = [step(base, x, u); u]`` (the 'discrete'
integrator — the u_prev update is a jump, which no continuous integrator can
express exactly).  The wrapped stage cost adds ``0.5 (u − u_prev)ᵀ S
(u − u_prev) · dt``.  The result IS a `System`: solve / MPC / vmap /
constraints compose unchanged.  The base system's own integrator (explicit or
implicit) is applied inside the discrete map, so nothing about the physics
discretization changes.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import Partial

from ilqr_tpu.models.base import System, quad_form


def f_disc(params, z, u):
    base_sys: System = params["base_sys"]
    n_x = base_sys.n_x
    from ilqr_tpu.ops.integrators import step

    x_next = step(base_sys, z[:n_x], u)
    return jnp.concatenate([x_next, u])


def stage_cost(params, z, u):
    base_sys: System = params["base_sys"]
    n_x = base_sys.n_x
    du = u - z[n_x:]
    base = base_sys.stage_cost(base_sys.params, z[:n_x], u)
    return base + 0.5 * quad_form(du, params["S"]) * base_sys.dt


def terminal_cost(params, z):
    base_sys: System = params["base_sys"]
    return base_sys.terminal_cost(base_sys.params, z[: base_sys.n_x])


def make_rate_penalized_system(base: System, S) -> System:
    """Wrap ``base`` with a quadratic penalty on control increments.

    S: (n_u, n_u) rate-penalty weight.  The returned system has
    ``n_x = base.n_x + base.n_u`` (trailing u_prev block); use
    `rate_augment_x0` / `strip_rate` at the boundary.
    """
    params = dict(base_sys=base, S=jnp.asarray(S))
    return System(
        params=params,
        n_x=base.n_x + base.n_u,
        n_u=base.n_u,
        dt=base.dt,
        f_cont=f_disc,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        integrator="discrete",
    )


def rate_augment_x0(x0, u_prev=None, n_u: int | None = None):
    """[x0; u_prev] — initial state for a rate-penalized system."""
    x0 = jnp.asarray(x0)
    if u_prev is None:
        u_prev = jnp.zeros((n_u,), dtype=x0.dtype)
    return jnp.concatenate([x0, jnp.asarray(u_prev)])


def strip_rate(Z, n_x: int):
    """Drop the trailing u_prev block from augmented states."""
    return Z[..., :n_x]
