"""iLQG: trajectory optimization for stochastic dynamics (Todorov & Li 2005).

Greenfield capability — the reference
(`/root/reference/python/class_files/iLQR_class.py`) is deterministic iLQR
only.  Model: discrete stochastic dynamics

    x⁺ = f(x, u) + C(x, u) · ξ,    ξ ~ N(0, I_{n_w}),

where the user supplies ``noise_fn(x, u) -> (n_x, n_w)`` (the columns of C are
the noise directions scaled by their standard deviations).  Minimizing the
EXPECTED cost changes only the backward pass: the Q-expansion gains the
noise-covariance terms of `ilqr_tpu.ops.riccati._noise_q_terms`.  Facts worth
knowing:

* additive noise (C constant) contributes nothing to the gains — certainty
  equivalence: the iLQG solution equals the deterministic iLQR one;
* state/control-dependent noise inflates Q_uu/Q_ux → "cautious" feedback;
* the nominal trajectory, line search, and convergence test stay
  deterministic (standard iLQG practice — the noise enters through the
  value-function curvature only).

Usage: ``it.solve(system, x0, U0, IlqrConfig(noise=noise_fn))`` — the solver
threads the per-step noise expansion into the sequential backward pass; all
rollout/line-search machinery composes unchanged (incl. DDP and control
limits).  This module holds the expansion helper and a Monte-Carlo
closed-loop simulator for validating policies under the actual noise.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import System, f32_matmuls
from ilqr_tpu.ops.integrators import step


class NoiseExpansion(NamedTuple):
    """Stacked noise model along a trajectory (time-major)."""

    C: jnp.ndarray    # (N, n_x, n_w)
    C_x: jnp.ndarray  # (N, n_x, n_w, n_x) — ∂C/∂x
    C_u: jnp.ndarray  # (N, n_x, n_w, n_u) — ∂C/∂u


def noise_expansion(
    noise_fn: Callable, X: jnp.ndarray, U: jnp.ndarray
) -> NoiseExpansion:
    """Evaluate C and its Jacobians at every stage point — embarrassingly
    parallel over time (vmapped), like `linearize_trajectory`."""

    def one(x, u):
        return (
            noise_fn(x, u),
            jax.jacfwd(noise_fn, argnums=0)(x, u),
            jax.jacfwd(noise_fn, argnums=1)(x, u),
        )

    C, C_x, C_u = jax.vmap(one)(X[:-1], U)
    return NoiseExpansion(C=C, C_x=C_x, C_u=C_u)


@f32_matmuls
def simulate_closed_loop(
    system: System,
    noise_fn: Callable,
    X_ref: jnp.ndarray,
    U_ref: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    n_rollouts: int = 32,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monte-Carlo cost of tracking (X_ref, U_ref) with feedback K under the
    stochastic dynamics x⁺ = f(x, u) + C(x, u)·ξ.

    u_k = U_ref_k + α·K_k (x_k − X_ref_k).  Returns (mean, std) of the cost
    over ``n_rollouts`` noise realizations (vmapped — one device program).
    """
    N = U_ref.shape[0]
    n_w = noise_fn(X_ref[0], U_ref[0]).shape[-1]

    def one(k):
        xis = jax.random.normal(k, (N, n_w), dtype=X_ref.dtype)

        def body(carry, inp):
            x, c = carry
            x_ref, u_ref, K_k, xi = inp
            u = u_ref + alpha * (K_k @ (x - x_ref))
            c = c + system.stage_cost(system.params, x, u)
            x1 = step(system, x, u) + noise_fn(x, u) @ xi
            return (x1, c), None

        (x_N, cost), _ = jax.lax.scan(
            body, (X_ref[0], 0.0), (X_ref[:-1], U_ref, K, xis)
        )
        return cost + system.terminal_cost(system.params, x_N)

    costs = jax.vmap(one)(jax.random.split(key, n_rollouts))
    return jnp.mean(costs), jnp.std(costs)


def additive_noise(C: jnp.ndarray) -> Callable:
    """Constant (state/control-independent) noise model — certainty
    equivalent: gains match deterministic iLQR exactly."""
    C = jnp.asarray(C)

    def fn(x, u):
        return C

    return fn


def control_multiplicative_noise(sigma: float, B: jnp.ndarray) -> Callable:
    """Effort-proportional actuation noise, the canonical iLQG 'cautious
    control' setting: noise column j is σ·u_j·B[:, j], i.e. each actuator's
    disturbance grows with its commanded effort and enters the state through
    that actuator's input channel B[:, j] (n_x, n_u)."""
    B = jnp.asarray(B)

    def fn(x, u):
        return sigma * B * u[None, :]

    return fn
