"""Parallel-in-time Kalman filtering and smoothing (associative scans).

The sequential filters in `ilqr_tpu.estimation` are O(N)-depth scans — the
same latency shape as the reference's Riccati recursion (the reference has no
estimation at all; `/root/reference/python/run_iLQR_MPC.py:118-130` reads the
plant state directly).  This module runs the full Bayesian pass in O(log N)
depth using the associative filtering/smoothing elements of Särkkä &
García-Fernández (IEEE TAC 2021, "Temporal parallelization of Bayesian
smoothers" — see PAPERS.md), which are DUAL to the parallel Riccati elements:
the filtering element is the same (A, b, C, η, J) five-tuple with the same
non-commutative combine as `ops/parallel_riccati.py::combine`, scanned as a
PREFIX (forward) instead of a suffix — this module reuses that element
algebra verbatim.

Nonlinear systems go through the iterated scheme: linearize the dynamics and
observation model along a reference trajectory, run the exact affine
filter/smoother in parallel, re-linearize along the smoothed means, repeat
(IEKS; each sweep is O(log N) and the fixed point matches the sequential
iterated smoother — the same frozen-linearization pattern as the solver's
defect line search and parallel DDP).

Conventions match `estimation.run_ekf`/`run_eks`: U: (N, n_u), Y: (N, n_y)
with Y[k] measured AFTER applying U[k], so estimate index k refers to
x_{k+1}.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.estimation import EkfState
from ilqr_tpu.models.base import System, f32_matmuls
from ilqr_tpu.ops.integrators import step
from ilqr_tpu.ops.parallel_riccati import RiccatiElement, combine
from ilqr_tpu.ops.smallmat import solve_small


def _filter_elements(F, c, H, d, Q_proc, R_obs, m0, P0, Y):
    """Associative filtering elements for the affine chain
    x_{t+1} = F_t x_t + c_t + w,  y_t = H_t x_{t+1} + d_t + v.

    Element k (for k ≥ 1) conditions on y_k alone; element 0 additionally
    carries the prior (m0, P0).  Combined prefixes e_0 ⊗ … ⊗ e_k have
    b = filtered mean, C = filtered covariance of x_{k+1} | y_{0..k}
    (Särkkä & García-Fernández 2021, Lemmas 7-8).
    """
    n_x = m0.shape[0]
    eye = jnp.eye(n_x, dtype=m0.dtype)

    def generic(F_k, c_k, H_k, d_k, y_k):
        S = H_k @ Q_proc @ H_k.T + R_obs
        K = solve_small(S, H_k @ Q_proc).T          # Q Hᵀ S⁻¹
        resid = y_k - H_k @ c_k - d_k
        IKH = eye - K @ H_k
        HtSinv = solve_small(S, H_k).T              # Hᵀ S⁻¹
        return RiccatiElement(
            A=IKH @ F_k,
            b=c_k + K @ resid,
            C=IKH @ Q_proc,
            eta=F_k.T @ (HtSinv @ resid),
            J=F_k.T @ (HtSinv @ H_k) @ F_k,
        )

    elems = jax.vmap(generic)(F, c, H, d, Y)

    # First element: propagate the prior through step 0, then update on y_0.
    m_pred = F[0] @ m0 + c[0]
    P_pred = F[0] @ P0 @ F[0].T + Q_proc
    S0 = H[0] @ P_pred @ H[0].T + R_obs
    K0 = solve_small(S0, H[0] @ P_pred).T
    # Joseph form, matching estimation.ekf_update's f32 robustness — the
    # plain (I−KH)P update can lose PSD-ness under roundoff.
    IKH0 = eye - K0 @ H[0]
    C0 = IKH0 @ P_pred @ IKH0.T + K0 @ R_obs @ K0.T
    e0 = RiccatiElement(
        A=jnp.zeros_like(P0),
        b=m_pred + K0 @ (Y[0] - H[0] @ m_pred - d[0]),
        C=0.5 * (C0 + C0.T),
        eta=jnp.zeros_like(m0),
        J=jnp.zeros_like(P0),
    )
    return jax.tree.map(lambda a0, ak: ak.at[0].set(a0), e0, elems)


@f32_matmuls
def kalman_filter_parallel(F, c, H, d, Q_proc, R_obs, m0, P0, Y
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact affine-model Kalman filter in O(log N) depth.

    F: (N, n_x, n_x), c: (N, n_x), H: (N, n_y, n_x), d: (N, n_y),
    Y: (N, n_y); time-invariant Q_proc/R_obs.  Returns (X_hat (N, n_x),
    P (N, n_x, n_x)) — the filtered moments of x_{k+1} | y_{0..k}, matching
    `estimation.run_ekf`'s alignment.
    """
    elems = _filter_elements(F, c, H, d, Q_proc, R_obs, m0, P0, Y)
    prefix = jax.lax.associative_scan(combine, elems, axis=0)
    P = 0.5 * (prefix.C + jnp.swapaxes(prefix.C, -1, -2))
    return prefix.b, P


class SmootherElement(NamedTuple):
    E: jnp.ndarray  # (..., n_x, n_x) conditional gain
    g: jnp.ndarray  # (..., n_x) offset
    L: jnp.ndarray  # (..., n_x, n_x) conditional covariance


def smoother_combine(ei: SmootherElement, ej: SmootherElement
                     ) -> SmootherElement:
    """Associative combine of an earlier element ei with a later ej."""
    return SmootherElement(
        E=ei.E @ ej.E,
        g=(ei.E @ ej.g[..., None])[..., 0] + ei.g,
        L=ei.E @ ej.L @ jnp.swapaxes(ei.E, -1, -2) + ei.L,
    )


@f32_matmuls
def kalman_smoother_parallel(F, c, Q_proc, X_f, P_f
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RTS smoothing of filtered moments in O(log N) depth.

    F/c index convention: F[k] maps estimate k to estimate k+1 (i.e. the
    transition APPLIED AFTER the filtered moment (X_f[k], P_f[k])).  The
    last filtered moment is its own smoothed moment.  Returns
    (X_s, P_s) with the same shapes/alignment as the inputs.
    """
    Fn, cn = F, c

    def elem(mf, Pf, F_next, c_next):
        Pp = F_next @ Pf @ F_next.T + Q_proc
        E = solve_small(Pp, F_next @ Pf).T       # Pf Fᵀ Pp⁻¹
        g = mf - E @ (F_next @ mf + c_next)
        L = Pf - E @ F_next @ Pf
        return SmootherElement(E=E, g=g, L=0.5 * (L + L.T))

    elems = jax.vmap(elem)(X_f[:-1], P_f[:-1], Fn, cn)
    last = SmootherElement(E=jnp.zeros_like(P_f[-1]), g=X_f[-1], L=P_f[-1])
    elems = jax.tree.map(
        lambda a, z: jnp.concatenate([a, z[None]], axis=0), elems, last)
    suffix = jax.lax.associative_scan(
        lambda a, b: smoother_combine(b, a), elems, reverse=True, axis=0)
    P_s = 0.5 * (suffix.L + jnp.swapaxes(suffix.L, -1, -2))
    return suffix.g, P_s


def _default_x_lin(system: System, x0: jnp.ndarray, U: jnp.ndarray):
    """Linearization trajectory for the iterated schemes, parallel-in-time.

    A sequential `rollout` here would be the ONLY O(N)-depth stage of the
    whole pass (measured 1.6 s of a 2 s N=100k parallel filter run before
    this); the defect-parallel Newton sweeps build the same open-loop
    trajectory in O(log N).  If they diverge (non-contracting dynamics from
    this record), fall back to the constant-x̂0 trajectory — the iterated
    re-linearization repairs a crude starting reference, same as
    `shooting.solve_ms`'s init.  Divergence means non-finite OR a residual
    defect large relative to the trajectory scale: a non-contracting sweep
    can stall at a finite-but-garbage defect without overflowing.
    """
    from ilqr_tpu.ops.parallel_rollout import open_loop_defect_rollout

    X_lin, _, defect = open_loop_defect_rollout(system, x0, U, iters=8,
                                                exit_tol=1e-6)
    scale = 1.0 + jnp.max(jnp.abs(X_lin))
    ok = jnp.isfinite(defect) & (defect < 1e-3 * scale)
    const = jnp.broadcast_to(x0, X_lin.shape)
    return jnp.where(ok, X_lin, const)


def _linearize_models(system: System, obs_fn: Callable, X_lin, U):
    """Affine dynamics/observation models along a reference trajectory.

    X_lin: (N+1, n_x) linearization points (X_lin[k] for the transition with
    U[k], X_lin[k+1] for the observation of x_{k+1})."""

    def one(x_k, x_k1, u):
        F = jax.jacfwd(lambda x: step(system, x, u))(x_k)
        c = step(system, x_k, u) - F @ x_k
        H = jax.jacfwd(obs_fn)(x_k1)
        d = obs_fn(x_k1) - H @ x_k1
        return F, c, H, d

    return jax.vmap(one)(X_lin[:-1], X_lin[1:], U)


@f32_matmuls
def run_eks_parallel(
    system: System,
    obs_fn: Callable,
    s0: EkfState,
    U: jnp.ndarray,
    Y: jnp.ndarray,
    Q_proc: jnp.ndarray,
    R_obs: jnp.ndarray,
    iters: int = 2,
    X_lin: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterated extended RTS smoother, every sweep O(log N) depth (IEKS).

    Each iteration linearizes dynamics + observation along the current
    reference (initially the open-loop rollout of U unless ``X_lin`` is
    given; built with the defect-parallel Newton sweeps so even the
    initialization is O(log N) depth), runs the exact affine
    filter + smoother in parallel, and re-linearizes along the smoothed
    means.  Matches the sequential `estimation.run_eks` at the fixed point
    of its linearization (run_eks linearizes at running filtered estimates;
    one extra iteration here typically dominates that accuracy).

    Returns (X_s (N, n_x), P_s (N, n_x, n_x)) aligned like `run_eks`.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if X_lin is None:
        X_lin = _default_x_lin(system, s0.x_hat, U)

    # fori_loop, not a Python loop: the body (vmapped Jacobians + two
    # associative scans) compiles ONCE regardless of iters — an unrolled
    # 2-iteration program at N=100k OOM-killed the XLA compile.
    def body(_, carry):
        X_ref, _, _ = carry
        F, c, H, d = _linearize_models(system, obs_fn, X_ref, U)
        X_f, P_f = kalman_filter_parallel(
            F, c, H, d, Q_proc, R_obs, s0.x_hat, s0.P, Y)
        X_s, P_s = kalman_smoother_parallel(F[1:], c[1:], Q_proc, X_f, P_f)
        return jnp.concatenate([s0.x_hat[None], X_s], axis=0), X_s, P_s

    n_x = s0.x_hat.shape[0]
    N = U.shape[0]
    init = (X_lin, jnp.zeros((N, n_x), X_lin.dtype),
            jnp.zeros((N, n_x, n_x), X_lin.dtype))
    _, X_s, P_s = jax.lax.fori_loop(0, iters, body, init)
    return X_s, P_s


@f32_matmuls
def run_ekf_parallel(
    system: System,
    obs_fn: Callable,
    s0: EkfState,
    U: jnp.ndarray,
    Y: jnp.ndarray,
    Q_proc: jnp.ndarray,
    R_obs: jnp.ndarray,
    X_lin: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-pass parallel extended Kalman filter (fixed linearization).

    Linearizes along ``X_lin`` (default: the open-loop trajectory of U via
    the defect-parallel sweeps) and runs the exact affine filter in O(log N)
    depth.  Unlike the sequential EKF —
    which linearizes at the RUNNING estimate — the linearization here is
    fixed, so on strongly nonlinear records prefer `run_eks_parallel` with
    iters ≥ 2 (the smoother feedback restores the accuracy).  Returns
    (X_hat, P) aligned like `estimation.run_ekf`.
    """
    if X_lin is None:
        X_lin = _default_x_lin(system, s0.x_hat, U)
    F, c, H, d = _linearize_models(system, obs_fn, X_lin, U)
    return kalman_filter_parallel(F, c, H, d, Q_proc, R_obs,
                                  s0.x_hat, s0.P, Y)
