"""EKF + output-feedback LQG (ilqr_tpu.estimation).

Oracles: exact agreement with a numpy Kalman filter on a linear system (the
EKF's Jacobians are exact there); bounded estimation error under partial
observation of the pendulum; and closed-loop LQG beating open-loop replay
under process + measurement noise.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.estimation import (
    EkfState,
    ekf_step,
    run_ekf,
    simulate_output_feedback,
)
from ilqr_tpu.models.linear import make_lti
from ilqr_tpu.ops.integrators import step


def test_ekf_matches_kalman_filter_on_linear_system():
    dt = 0.05
    A = jnp.array([[0.0, 1.0], [-1.0, -0.2]])
    B = jnp.array([[0.0], [1.0]])
    sys_ = make_lti(A, B, dt, [0.0, 0.0], jnp.eye(2), jnp.eye(1),
                    jnp.zeros((2, 2)), integrator="euler")
    H = jnp.array([[1.0, 0.0]])
    obs_fn = lambda x: H @ x
    Q_proc = 0.01 * jnp.eye(2)
    R_obs = 0.04 * jnp.eye(1)

    N = 60
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    U = 0.5 * jax.random.normal(k1, (N, 1))
    # True trajectory with process noise; measurements of x[0] with noise.
    Ws = 0.1 * jax.random.normal(k2, (N, 2))
    Vs = 0.2 * jax.random.normal(k3, (N, 1))
    xs = [jnp.array([0.4, -0.3])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k]) + Ws[k])
    X_true = jnp.stack(xs)
    Y = jax.vmap(obs_fn)(X_true[1:]) + Vs

    s0 = EkfState(x_hat=jnp.zeros(2), P=jnp.eye(2))
    _, X_hat, _ = run_ekf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)

    # numpy Kalman filter (Joseph form), exact for the linear model.
    Ad = np.eye(2) + dt * np.asarray(A)
    Bd = dt * np.asarray(B)
    Hn, Qn, Rn = np.asarray(H), np.asarray(Q_proc), np.asarray(R_obs)
    x, P = np.zeros(2), np.eye(2)
    for k in range(N):
        x = Ad @ x + Bd @ np.asarray(U[k])
        P = Ad @ P @ Ad.T + Qn
        P = 0.5 * (P + P.T)
        S = Hn @ P @ Hn.T + Rn
        K = P @ Hn.T @ np.linalg.inv(S)
        x = x + K @ (np.asarray(Y[k]) - Hn @ x)
        IKH = np.eye(2) - K @ Hn
        P = IKH @ P @ IKH.T + K @ Rn @ K.T
        P = 0.5 * (P + P.T)
        np.testing.assert_allclose(X_hat[k], x, rtol=2e-4, atol=2e-4)


def test_ekf_bounds_error_under_partial_observation():
    """Pendulum, measure θ only, wrong initial estimate: the filter pulls the
    estimate to the true state; dead reckoning from the same wrong estimate
    does not."""
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=jnp.zeros((2, 2)),
                            d=0.05, integrator="rk4")
    obs_fn = lambda x: x[:1]
    Q_proc = 1e-5 * jnp.eye(2)
    R_obs = 1e-3 * jnp.eye(1)

    N = 400
    U = 0.6 * jnp.sin(0.02 * jnp.arange(N))[:, None]
    x = jnp.array([0.3, 0.0])
    xs = [x]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k]))
    X_true = jnp.stack(xs)
    key = jax.random.PRNGKey(0)
    Y = X_true[1:, :1] + jnp.sqrt(1e-3) * jax.random.normal(key, (N, 1))

    x0_wrong = jnp.array([-0.4, 0.8])
    s0 = EkfState(x_hat=x0_wrong, P=jnp.eye(2))
    _, X_hat, _ = run_ekf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)
    err_ekf = float(jnp.linalg.norm(X_hat[-1] - X_true[-1]))

    # Dead reckoning from the same wrong initial estimate.
    xd = x0_wrong
    for k in range(N):
        xd = step(sys_, xd, U[k])
    err_dead = float(jnp.linalg.norm(xd - X_true[-1]))

    assert err_ekf < 0.05
    assert err_ekf < 0.2 * err_dead


def test_output_feedback_lqg_beats_open_loop_replay():
    """Full LQG stack on the swing-up: EKF from θ measurements + the solver's
    feedback gains tracks the plan; open-loop replay drifts."""
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=10.0 * jnp.eye(2),
                            d=0.1, integrator="rk4")
    sol = it.solve(sys_, jnp.zeros(2), jnp.zeros((300, 1)),
                   it.IlqrConfig(maxiter=80, tol=1e-7))
    assert int(sol.status) == 1

    obs_fn = lambda x: x[:1]
    Q_proc = 1e-5 * jnp.eye(2)
    R_obs = 1e-4 * jnp.eye(1)
    s0 = EkfState(x_hat=jnp.zeros(2), P=0.01 * jnp.eye(2))
    key = jax.random.PRNGKey(1)

    _, _, _, cost_lqg = simulate_output_feedback(
        sys_, obs_fn, sol.X, sol.U, sol.K, s0, jnp.zeros(2), key,
        Q_proc, R_obs)
    _, _, _, cost_ol = simulate_output_feedback(
        sys_, obs_fn, sol.X, sol.U, jnp.zeros_like(sol.K), s0, jnp.zeros(2),
        key, Q_proc, R_obs)

    assert np.isfinite(float(cost_lqg))
    assert float(cost_lqg) < 2.0 * float(sol.cost)
    assert float(cost_lqg) < float(cost_ol)
