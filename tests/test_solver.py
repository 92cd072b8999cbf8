"""Solver tests: golden-trajectory parity vs the reference implementation,
monotone-cost property, convergence semantics (SURVEY.md §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _pendulum_ol_problem():
    # Reference config: run_iLQR_open_loop.py:16-68.
    sys_ = it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=jnp.zeros((2, 2)), d=0.0, integrator="backward_euler",
    )
    N = len(jnp.arange(0, 4.0 + 0.01, 0.01)) - 1
    return sys_, jnp.array([1.0, 0.0]), jnp.zeros((N, 1)), it.IlqrConfig(
        maxiter=100, tol=1e-5
    )


def _dp_ol_problem():
    # Reference config: run_double_pendulum_open_loop.py:14-75.
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    N = len(jnp.arange(0, 5.0 + 0.01, 0.01)) - 1
    return sys_, jnp.zeros(4), jnp.zeros((N, 2)), it.IlqrConfig(
        maxiter=200, tol=1e-6
    )


def _ua_dp_ol_problem():
    # Reference config: run_iLQR_OL_UA_Pendulum.py:14-75.
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([1.0, 1.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([1.0])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12,
        underactuated=True, integrator="backward_euler",
    )
    N = len(jnp.arange(0, 8.0 + 0.01, 0.01)) - 1
    return sys_, jnp.zeros(4), jnp.zeros((N, 1)), it.IlqrConfig(
        maxiter=700, tol=1e-5
    )


def _golden(name):
    d = np.load(os.path.join(GOLDEN, name))
    # Reference layout is (dim, time); ours is time-major.
    return d["X"].T, d["U"].T, float(d["cost"])


def test_pendulum_parity_with_reference():
    sys_, x0, U0, cfg = _pendulum_ol_problem()
    sol = jax.jit(it.solve, static_argnums=3)(sys_, x0, U0, cfg)
    X_ref, U_ref, cost_ref = _golden("pendulum_ol.npz")
    assert int(sol.status) == it.CONVERGED
    np.testing.assert_allclose(float(sol.cost), cost_ref, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sol.X), X_ref, atol=5e-2)
    np.testing.assert_allclose(np.asarray(sol.U), U_ref, atol=5e-2)


def test_double_pendulum_parity_with_reference():
    """The double pendulum is chaotic: fp32 accumulation-order differences put
    iLQR into different (equally valid) local minima, so trajectory-level
    bitwise parity is not well-posed.  Model-level parity is asserted
    exhaustively in test_model_parity.py; here we require the solution to be
    AT LEAST as good as the reference's and to reach the same target."""
    sys_, x0, U0, cfg = _dp_ol_problem()
    sol = jax.jit(it.solve, static_argnums=3)(sys_, x0, U0, cfg)
    X_ref, U_ref, cost_ref = _golden("double_pendulum_ol.npz")
    assert float(sol.cost) <= cost_ref * 1.02, (
        f"cost {float(sol.cost):.3f} worse than reference {cost_ref:.3f}"
    )
    # Swing-up reached: both end upright at the target.
    np.testing.assert_allclose(np.asarray(sol.X)[-1][:2], X_ref[-1][:2], atol=0.2)


@pytest.mark.slow
def test_ua_double_pendulum_parity_with_reference():
    sys_, x0, U0, cfg = _ua_dp_ol_problem()
    sol = jax.jit(it.solve, static_argnums=3)(sys_, x0, U0, cfg)
    X_ref, U_ref, cost_ref = _golden("ua_double_pendulum_ol.npz")
    assert float(sol.cost) <= cost_ref * 1.05
    np.testing.assert_allclose(np.asarray(sol.X)[-1][:2], X_ref[-1][:2], atol=0.2)


def test_monotone_cost_decrease():
    sys_, x0, U0, cfg = _pendulum_ol_problem()
    sol = it.solve(sys_, x0, U0, cfg)
    trace = np.asarray(sol.cost_trace)
    trace = trace[~np.isnan(trace)]
    assert len(trace) >= 2
    assert np.all(np.diff(trace) <= 1e-6), "cost must be non-increasing"


def test_ilqr_on_linear_system_matches_lqr_oracle():
    """An iLQR on an exactly-linear system must reach the analytic LQR optimum
    (the reference's Linear_iLQR_CLASS cross-check, `matlab/main_.m`)."""
    dt, N = 0.1, 40
    A_c = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    B_c = jnp.array([[0.0], [1.0]])
    A_d, B_d = it.cont2disc(A_c, B_c, dt)

    Q = jnp.eye(2)
    R = jnp.eye(1)
    Q_f = 10.0 * jnp.eye(2)
    x0 = jnp.array([1.0, 0.0])

    lqr = it.lqr_solve(A_d, B_d, Q, R, Q_f, x0, N)

    # Same problem through the iLQR path: discrete dynamics expressed as a
    # "continuous" Euler step that reproduces x⁺ = A_d x + B_d u exactly.
    def f_cont(params, x, u):
        return (params["A_d"] @ x + params["B_d"] @ u - x) / params["dt"]

    from ilqr_tpu.models.base import (
        System, quadratic_stage_cost, quadratic_terminal_cost,
    )

    params = dict(A_d=A_d, B_d=B_d, dt=jnp.asarray(dt),
                  x_target=jnp.zeros(2), Q=Q / dt, R=R / dt, Q_f=Q_f)
    sys_ = System(params=params, n_x=2, n_u=1, dt=dt, f_cont=f_cont,
                  stage_cost=quadratic_stage_cost,
                  terminal_cost=quadratic_terminal_cost, integrator="euler")
    sol = it.solve(sys_, x0, jnp.zeros((N, 1)), it.IlqrConfig(maxiter=5, tol=1e-10))
    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(lqr.U), atol=1e-4)
    np.testing.assert_allclose(float(sol.cost), float(lqr.cost), rtol=1e-5)


def test_solver_vmaps():
    """The whole solve must vmap over a batch of initial states."""
    sys_, x0, U0, _ = _pendulum_ol_problem()
    cfg = it.IlqrConfig(maxiter=15, tol=1e-5)
    x0s = jnp.stack([x0, x0 + jnp.array([0.2, 0.0]), x0 - jnp.array([0.5, 0.1])])
    sols = jax.vmap(lambda x: it.solve(sys_, x, U0, cfg))(x0s)
    assert sols.X.shape == (3, U0.shape[0] + 1, 2)
    single = it.solve(sys_, x0s[1], U0, cfg)
    np.testing.assert_allclose(
        np.asarray(sols.cost[1]), float(single.cost), rtol=1e-4
    )
