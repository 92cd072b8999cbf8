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
    run_eks,
    run_ukf,
    simulate_output_feedback,
    ukf_step,
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
    # tol=1e-6: a 1e-7 Δcost is below the f32 resolution at this cost scale,
    # where the stall can read as line-search failure instead of convergence.
    sol = it.solve(sys_, jnp.zeros(2), jnp.zeros((300, 1)),
                   it.IlqrConfig(maxiter=80, tol=1e-6))
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


def test_ukf_matches_kalman_filter_on_linear_system():
    """On a linear system the unscented transform is exact: UKF == KF == EKF."""
    dt = 0.05
    A = jnp.array([[0.0, 1.0], [-1.0, -0.2]])
    B = jnp.array([[0.0], [1.0]])
    sys_ = make_lti(A, B, dt, [0.0, 0.0], jnp.eye(2), jnp.eye(1),
                    jnp.zeros((2, 2)), integrator="euler")
    obs_fn = lambda x: jnp.array([[1.0, 0.0]]) @ x
    Q_proc = 0.01 * jnp.eye(2)
    R_obs = 0.04 * jnp.eye(1)

    N = 60
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    U = 0.5 * jax.random.normal(k1, (N, 1))
    xs = [jnp.array([0.4, -0.3])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k]) + 0.1 * jax.random.normal(
            jax.random.fold_in(k2, k), (2,)))
    X_true = jnp.stack(xs)
    Y = jax.vmap(obs_fn)(X_true[1:]) + 0.2 * jax.random.normal(k3, (N, 1))

    s0 = EkfState(x_hat=jnp.zeros(2), P=jnp.eye(2))
    _, Xh_ekf, P_ekf = run_ekf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)
    _, Xh_ukf, P_ukf = run_ukf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)
    np.testing.assert_allclose(Xh_ukf, Xh_ekf, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(P_ukf, P_ekf, rtol=5e-3, atol=5e-3)


def test_ukf_partial_observation_pendulum():
    """UKF on the damped pendulum with a NONLINEAR observation y = [sinθ, cosθ]
    converges from a wrong initial estimate (same protocol as the EKF test)."""
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=jnp.zeros((2, 2)),
                            d=0.05, integrator="rk4")
    obs_fn = lambda x: jnp.array([jnp.sin(x[0]), jnp.cos(x[0])])
    Q_proc = 1e-5 * jnp.eye(2)
    R_obs = 1e-3 * jnp.eye(2)

    N = 400
    U = 0.6 * jnp.sin(0.02 * jnp.arange(N))[:, None]
    xs = [jnp.array([0.3, 0.0])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k]))
    X_true = jnp.stack(xs)
    key = jax.random.PRNGKey(0)
    Y = jax.vmap(obs_fn)(X_true[1:]) + jnp.sqrt(1e-3) * jax.random.normal(
        key, (N, 2))

    s0 = EkfState(x_hat=jnp.array([-0.4, 0.8]), P=jnp.eye(2))
    _, X_hat, Ps = run_ukf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)
    assert float(jnp.linalg.norm(X_hat[-1] - X_true[-1])) < 0.05
    # Covariances stay symmetric PSD through the scan.
    eigs = jnp.linalg.eigvalsh(Ps)
    assert float(eigs.min()) > -1e-6


def test_output_feedback_with_ukf_filter_step():
    """simulate_output_feedback(filter_step=ukf_step) closes the loop too."""
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=10.0 * jnp.eye(2),
                            d=0.1, integrator="rk4")
    sol = it.solve(sys_, jnp.zeros(2), jnp.zeros((300, 1)),
                   it.IlqrConfig(maxiter=80, tol=1e-7))
    obs_fn = lambda x: x[:1]
    s0 = EkfState(x_hat=jnp.zeros(2), P=0.01 * jnp.eye(2))
    _, _, _, cost_ukf = simulate_output_feedback(
        sys_, obs_fn, sol.X, sol.U, sol.K, s0, jnp.zeros(2),
        jax.random.PRNGKey(1), 1e-5 * jnp.eye(2), 1e-4 * jnp.eye(1),
        filter_step=ukf_step)
    assert np.isfinite(float(cost_ukf))
    assert float(cost_ukf) < 2.0 * float(sol.cost)


def test_eks_matches_batch_map_on_linear_system():
    """RTS smoother oracle: on a linear-Gaussian system the smoothed means are
    the MAP solution of the full batch least-squares problem, solved densely
    in numpy over the stacked trajectory."""
    dt = 0.05
    A = jnp.array([[0.0, 1.0], [-0.8, -0.3]])
    B = jnp.array([[0.0], [1.0]])
    sys_ = make_lti(A, B, dt, [0.0, 0.0], jnp.eye(2), jnp.eye(1),
                    jnp.zeros((2, 2)), integrator="euler")
    H = np.array([[1.0, 0.0]])
    obs_fn = lambda x: jnp.asarray(H) @ x
    Q_proc = 0.02 * jnp.eye(2)
    R_obs = 0.05 * jnp.eye(1)

    N = 25
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    U = 0.5 * jax.random.normal(k1, (N, 1))
    xs = [jnp.array([0.4, -0.3])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k])
                  + jnp.sqrt(0.02) * jax.random.normal(
                      jax.random.fold_in(k2, k), (2,)))
    X_true = jnp.stack(xs)
    Y = jax.vmap(obs_fn)(X_true[1:]) + jnp.sqrt(0.05) * jax.random.normal(
        k3, (N, 1))

    x0_mean, P0 = jnp.zeros(2), jnp.eye(2)
    s0 = EkfState(x_hat=x0_mean, P=P0)
    X_s, P_s = run_eks(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)

    # Dense batch MAP over z = [x_0, ..., x_N] (2(N+1) unknowns):
    # minimize |x_0 - x0_mean|²_{P0⁻¹} + Σ|x_{k+1} - Ad x_k - Bd u_k|²_{Q⁻¹}
    #        + Σ|y_k - H x_{k+1}|²_{R⁻¹}  →  normal equations.
    Ad = np.eye(2) + dt * np.asarray(A)
    Bd = dt * np.asarray(B)
    n = 2 * (N + 1)
    Lam = np.zeros((n, n))      # information matrix
    eta = np.zeros(n)           # information vector
    iP0 = np.linalg.inv(np.asarray(P0))
    Lam[:2, :2] += iP0
    eta[:2] += iP0 @ np.asarray(x0_mean)
    iQ = np.linalg.inv(np.asarray(Q_proc))
    iR = np.linalg.inv(np.asarray(R_obs))
    for k in range(N):
        i, j = 2 * k, 2 * (k + 1)
        b = Bd @ np.asarray(U[k])
        # dynamics factor between x_k and x_{k+1}
        Lam[i:i+2, i:i+2] += Ad.T @ iQ @ Ad
        Lam[i:i+2, j:j+2] -= Ad.T @ iQ
        Lam[j:j+2, i:i+2] -= iQ @ Ad
        Lam[j:j+2, j:j+2] += iQ
        eta[i:i+2] -= Ad.T @ iQ @ b
        eta[j:j+2] += iQ @ b
        # measurement factor on x_{k+1}
        Lam[j:j+2, j:j+2] += H.T @ iR @ H
        eta[j:j+2] += H.T @ iR @ np.asarray(Y[k])
    z = np.linalg.solve(Lam, eta)
    X_map = z.reshape(N + 1, 2)[1:]     # x_1..x_N, matching X_s alignment

    np.testing.assert_allclose(np.asarray(X_s), X_map, rtol=2e-3, atol=2e-3)
    # Smoothing can't increase uncertainty: tr(P_s) <= tr(P_f) + eps.
    _, _, Pf = run_ekf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)
    tr_s = np.trace(np.asarray(P_s), axis1=1, axis2=2)
    tr_f = np.trace(np.asarray(Pf), axis1=1, axis2=2)
    assert np.all(tr_s <= tr_f + 1e-5)


def test_eks_reduces_error_on_pendulum():
    """Extended smoother beats the filter in mid-trajectory RMSE on the noisy
    pendulum (it sees future measurements; the filter does not)."""
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=jnp.zeros((2, 2)),
                            d=0.05, integrator="rk4")
    obs_fn = lambda x: x[:1]
    Q_proc = 1e-4 * jnp.eye(2)
    R_obs = 1e-2 * jnp.eye(1)

    N = 300
    key = jax.random.PRNGKey(5)
    kw, kv = jax.random.split(key)
    U = 0.6 * jnp.sin(0.02 * jnp.arange(N))[:, None]
    xs = [jnp.array([0.3, 0.0])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k])
                  + 1e-2 * jax.random.normal(jax.random.fold_in(kw, k), (2,)))
    X_true = jnp.stack(xs)
    Y = X_true[1:, :1] + 0.1 * jax.random.normal(kv, (N, 1))

    s0 = EkfState(x_hat=jnp.array([0.0, 0.5]), P=jnp.eye(2))
    _, Xf, _ = run_ekf(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)
    X_s, _ = run_eks(sys_, obs_fn, s0, U, Y, Q_proc, R_obs)

    mid = slice(10, N - 10)
    rmse_f = float(jnp.sqrt(jnp.mean((Xf[mid] - X_true[1:][mid]) ** 2)))
    rmse_s = float(jnp.sqrt(jnp.mean((X_s[mid] - X_true[1:][mid]) ** 2)))
    assert rmse_s < rmse_f
