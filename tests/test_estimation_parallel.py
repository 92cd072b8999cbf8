"""Parallel-in-time Kalman filtering/smoothing (ilqr_tpu.estimation_parallel).

Oracles: EXACT agreement with the sequential EKF/RTS on linear systems (the
associative elements are algebraically the same filter), and matched accuracy
of the iterated parallel smoother vs the sequential extended smoother on a
nonlinear pendulum record.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.estimation import EkfState, run_ekf, run_eks
from ilqr_tpu.estimation_parallel import (
    kalman_filter_parallel,
    kalman_smoother_parallel,
    run_ekf_parallel,
    run_eks_parallel,
)
from ilqr_tpu.models.linear import make_lti
from ilqr_tpu.ops.integrators import step


def _linear_record(N=60, seed=3):
    dt = 0.05
    A = jnp.array([[0.0, 1.0], [-1.0, -0.2]])
    B = jnp.array([[0.0], [1.0]])
    sys_ = make_lti(A, B, dt, [0.0, 0.0], jnp.eye(2), jnp.eye(1),
                    jnp.zeros((2, 2)), integrator="euler")
    H = jnp.array([[1.0, 0.0]])
    obs_fn = lambda x: H @ x
    Q_proc = 0.01 * jnp.eye(2)
    R_obs = 0.04 * jnp.eye(1)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    U = 0.5 * jax.random.normal(k1, (N, 1))
    Ws = 0.1 * jax.random.normal(k2, (N, 2))
    Vs = 0.2 * jax.random.normal(k3, (N, 1))
    xs = [jnp.array([0.4, -0.3])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k]) + Ws[k])
    X_true = jnp.stack(xs)
    Y = jax.vmap(obs_fn)(X_true[1:]) + Vs
    s0 = EkfState(x_hat=jnp.zeros(2), P=jnp.eye(2))
    return sys_, obs_fn, s0, U, Y, Q_proc, R_obs, X_true


def test_parallel_filter_matches_sequential_on_linear_system():
    sys_, obs_fn, s0, U, Y, Qp, Ro, _ = _linear_record()
    _, X_seq, P_seq = run_ekf(sys_, obs_fn, s0, U, Y, Qp, Ro)
    X_par, P_par = run_ekf_parallel(sys_, obs_fn, s0, U, Y, Qp, Ro)
    np.testing.assert_allclose(np.array(X_par), np.array(X_seq),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(P_par), np.array(P_seq),
                               rtol=1e-3, atol=1e-4)


def test_parallel_smoother_matches_sequential_on_linear_system():
    sys_, obs_fn, s0, U, Y, Qp, Ro, _ = _linear_record()
    Xs_seq, Ps_seq = run_eks(sys_, obs_fn, s0, U, Y, Qp, Ro)
    # One iteration: on a linear system the linearization is exact, so the
    # parallel smoother IS the RTS smoother.
    Xs_par, Ps_par = run_eks_parallel(sys_, obs_fn, s0, U, Y, Qp, Ro, iters=1)
    np.testing.assert_allclose(np.array(Xs_par), np.array(Xs_seq),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(Ps_par), np.array(Ps_seq),
                               rtol=1e-3, atol=1e-4)


def test_parallel_smoother_beats_filter_on_linear_system():
    sys_, obs_fn, s0, U, Y, Qp, Ro, X_true = _linear_record(N=120, seed=9)
    X_f, _ = run_ekf_parallel(sys_, obs_fn, s0, U, Y, Qp, Ro)
    X_s, _ = run_eks_parallel(sys_, obs_fn, s0, U, Y, Qp, Ro, iters=1)
    rms_f = float(jnp.sqrt(jnp.mean((X_f - X_true[1:]) ** 2)))
    rms_s = float(jnp.sqrt(jnp.mean((X_s - X_true[1:]) ** 2)))
    assert rms_s < rms_f


def test_iterated_parallel_smoother_matches_sequential_on_pendulum():
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=jnp.zeros((2, 2)),
                            d=0.05, integrator="rk4")
    obs_fn = lambda x: x[:1]
    Qp = 1e-5 * jnp.eye(2)
    Ro = 1e-3 * jnp.eye(1)
    N = 250
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    U = 2.0 * jnp.sin(jnp.linspace(0, 6, N))[:, None] \
        + 0.2 * jax.random.normal(k1, (N, 1))
    Ws = 3e-3 * jax.random.normal(k2, (N, 2))
    Vs = 3e-2 * jax.random.normal(k3, (N, 1))
    xs = [jnp.array([0.3, 0.0])]
    for k in range(N):
        xs.append(step(sys_, xs[-1], U[k]) + Ws[k])
    X_true = jnp.stack(xs)
    Y = jax.vmap(obs_fn)(X_true[1:]) + Vs
    s0 = EkfState(x_hat=jnp.array([0.3, 0.0]), P=0.1 * jnp.eye(2))

    Xs_seq, _ = run_eks(sys_, obs_fn, s0, U, Y, Qp, Ro)
    Xs_par, _ = run_eks_parallel(sys_, obs_fn, s0, U, Y, Qp, Ro, iters=3)
    rms_seq = float(jnp.sqrt(jnp.mean((Xs_seq - X_true[1:]) ** 2)))
    rms_par = float(jnp.sqrt(jnp.mean((Xs_par - X_true[1:]) ** 2)))
    # The iterated parallel smoother must estimate at least as well as the
    # sequential extended smoother (different linearization points — IEKS
    # re-linearizes at smoothed means, usually slightly better).
    assert rms_par <= 1.15 * rms_seq
    # And the two must agree closely as estimators of the same record.
    assert float(jnp.sqrt(jnp.mean((Xs_par - Xs_seq) ** 2))) < 5e-2


def test_parallel_filter_jit_vmap():
    sys_, obs_fn, s0, U, Y, Qp, Ro, _ = _linear_record()
    Ys = jnp.stack([Y, Y + 0.01])

    f = jax.jit(jax.vmap(lambda y: run_ekf_parallel(
        sys_, obs_fn, s0, U, y, Qp, Ro)[0]))
    out = f(Ys)
    assert out.shape == (2, U.shape[0], 2)
    assert bool(jnp.all(jnp.isfinite(out)))
