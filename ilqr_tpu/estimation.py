"""State estimation: extended Kalman filter + output-feedback (LQG) control.

Greenfield capability (no reference counterpart — the reference assumes full
state feedback everywhere, e.g. the MPC loop reads the plant state directly,
`/root/reference/python/run_iLQR_MPC.py:118-130`).  Together with
`ilqr_tpu.ilqg` this completes the classic LQG stack: solve for a nominal
trajectory + gains, then at runtime measure y = h(x) + v, filter to x̂, and
apply u = u_ref + K (x̂ − x_ref).

Model:
    x⁺ = f(x, u) + w,   w ~ N(0, Q_proc)      (process noise)
    y  = h(x) + v,      v ~ N(0, R_obs)       (measurement noise)

All operators are pure and jit/vmap-safe; the filter scan runs on-device.
EKF covariance update uses the Joseph form for f32 robustness.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import System, f32_matmuls
from ilqr_tpu.ops.integrators import step
from ilqr_tpu.ops.smallmat import solve_small


class EkfState(NamedTuple):
    x_hat: jnp.ndarray  # (n_x,) state estimate
    P: jnp.ndarray      # (n_x, n_x) estimate covariance


def ekf_predict(
    system: System, s: EkfState, u: jnp.ndarray, Q_proc: jnp.ndarray
) -> EkfState:
    """Propagate the estimate through the (discrete) dynamics."""
    x_pred = step(system, s.x_hat, u)
    A = jax.jacfwd(lambda x: step(system, x, u))(s.x_hat)
    P_pred = A @ s.P @ A.T + Q_proc
    return EkfState(x_hat=x_pred, P=0.5 * (P_pred + P_pred.T))


def ekf_update(
    obs_fn: Callable, s: EkfState, y: jnp.ndarray, R_obs: jnp.ndarray
) -> EkfState:
    """Measurement update (Joseph-form covariance)."""
    H = jax.jacfwd(obs_fn)(s.x_hat)          # (n_y, n_x)
    S = H @ s.P @ H.T + R_obs                # (n_y, n_y) innovation covariance
    # K = P Hᵀ S⁻¹ via one small solve: S Kᵀ = H P.
    K = solve_small(S, H @ s.P).T            # (n_x, n_y)
    x_new = s.x_hat + K @ (y - obs_fn(s.x_hat))
    I_KH = jnp.eye(s.P.shape[0], dtype=s.P.dtype) - K @ H
    P_new = I_KH @ s.P @ I_KH.T + K @ R_obs @ K.T
    return EkfState(x_hat=x_new, P=0.5 * (P_new + P_new.T))


def ekf_step(
    system: System,
    obs_fn: Callable,
    s: EkfState,
    u: jnp.ndarray,
    y: jnp.ndarray,
    Q_proc: jnp.ndarray,
    R_obs: jnp.ndarray,
) -> EkfState:
    """One predict(u) → update(y) cycle: y is measured AFTER applying u."""
    return ekf_update(obs_fn, ekf_predict(system, s, u, Q_proc), y, R_obs)


@f32_matmuls
def run_ekf(
    system: System,
    obs_fn: Callable,
    s0: EkfState,
    U: jnp.ndarray,
    Y: jnp.ndarray,
    Q_proc: jnp.ndarray,
    R_obs: jnp.ndarray,
) -> Tuple[EkfState, jnp.ndarray, jnp.ndarray]:
    """Filter a recorded (U, Y) sequence.  U: (N, n_u); Y: (N, n_y) with Y[k]
    measured after U[k].  Returns (final state, X_hat (N, n_x), P (N, n_x²))."""

    def body(s, inp):
        u, y = inp
        s1 = ekf_step(system, obs_fn, s, u, y, Q_proc, R_obs)
        return s1, (s1.x_hat, s1.P)

    s_f, (X_hat, Ps) = jax.lax.scan(body, s0, (U, Y))
    return s_f, X_hat, Ps


@f32_matmuls
def simulate_output_feedback(
    system: System,
    obs_fn: Callable,
    X_ref: jnp.ndarray,
    U_ref: jnp.ndarray,
    K_fb: jnp.ndarray,
    s0: EkfState,
    x0_true: jnp.ndarray,
    key: jax.Array,
    Q_proc: jnp.ndarray,
    R_obs: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-loop LQG execution: control from the EKF estimate.

    Per step k: u_k = U_ref_k + K_fb_k (x̂_k − X_ref_k); the TRUE plant steps
    with process noise w_k; a noisy measurement y = h(x⁺) + v_k feeds the
    filter.  Returns (X_true (N+1, n_x), X_hat (N+1, n_x), U (N, n_u), cost) —
    cost is the true incurred cost.
    """
    N = U_ref.shape[0]
    n_x = x0_true.shape[0]
    n_y = obs_fn(x0_true).shape[0]
    kw, kv = jax.random.split(key)
    Lw = jnp.linalg.cholesky(Q_proc + 1e-12 * jnp.eye(n_x, dtype=Q_proc.dtype))
    Lv = jnp.linalg.cholesky(R_obs + 1e-12 * jnp.eye(n_y, dtype=R_obs.dtype))
    Ws = jax.random.normal(kw, (N, n_x), X_ref.dtype) @ Lw.T
    Vs = jax.random.normal(kv, (N, n_y), X_ref.dtype) @ Lv.T

    def body(carry, inp):
        x, s, c = carry
        x_ref, u_ref, K_k, w, v = inp
        u = u_ref + K_k @ (s.x_hat - x_ref)
        c = c + system.stage_cost(system.params, x, u)
        x1 = step(system, x, u) + w
        y = obs_fn(x1) + v
        s1 = ekf_step(system, obs_fn, s, u, y, Q_proc, R_obs)
        return (x1, s1, c), (x1, s1.x_hat, u)

    (x_N, _, cost), (Xs, Xh, U) = jax.lax.scan(
        body, (x0_true, s0, 0.0), (X_ref[:-1], U_ref, K_fb, Ws, Vs)
    )
    cost = cost + system.terminal_cost(system.params, x_N)
    X_true = jnp.concatenate([x0_true[None], Xs], axis=0)
    X_hat = jnp.concatenate([s0.x_hat[None], Xh], axis=0)
    return X_true, X_hat, U, cost
