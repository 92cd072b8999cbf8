"""Pallas rollout kernels vs the XLA scan rollouts (interpret mode on CPU).

These kernels are an *experimental* alternative line-search engine
(IlqrConfig.rollout='pallas'); measurements on the chip showed XLA's vmapped
α-batch amortizes per-op overhead at least as well, so 'scan' remains the
default — the kernels stay correct and covered here.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.ops.pallas_rollout import (
    closed_loop_rollout_pallas,
    linesearch_costs_pallas,
)
from ilqr_tpu.ops.rollout import closed_loop_rollout, linesearch_rollouts


def _setup(N=300):
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    x0 = jnp.array([1.0, 0.0])
    U_old = 0.1 * jnp.sin(jnp.linspace(0, 6.0, N))[:, None]
    X_old, _ = it.rollout(sys_, x0, U_old)
    uff = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (N, 1))
    K = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N, 1, 2))
    return sys_, x0, X_old, U_old, uff, K


def test_linesearch_costs_match():
    sys_, x0, X_old, U_old, uff, K = _setup()
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625])
    _, _, ref = linesearch_rollouts(sys_, x0, alphas, X_old, U_old, uff, K)
    got = linesearch_costs_pallas(sys_, x0, alphas, X_old, U_old, uff, K,
                                  interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_trajectory_kernel_matches():
    sys_, x0, X_old, U_old, uff, K = _setup(N=200)
    Xr, Ur, cr = closed_loop_rollout(sys_, x0, 0.5, X_old, U_old, uff, K)
    Xp, Up, cp = closed_loop_rollout_pallas(sys_, x0, 0.5, X_old, U_old, uff, K,
                                            interpret=True)
    np.testing.assert_allclose(Xp, Xr, atol=1e-5)
    np.testing.assert_allclose(Up, Ur, atol=1e-5)
    np.testing.assert_allclose(float(cp), float(cr), rtol=1e-5)


def test_double_pendulum_costs_match():
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0, 0, 0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([10.0, 10.0, 1.0, 1.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    N = 100
    x0 = jnp.zeros(4)
    U_old = 0.2 * jnp.ones((N, 2))
    X_old, _ = it.rollout(sys_, x0, U_old)
    uff = 0.05 * jnp.ones((N, 2))
    K = 0.02 * jnp.ones((N, 2, 4))
    alphas = jnp.asarray([1.0, 0.5, 0.25])
    _, _, ref = linesearch_rollouts(sys_, x0, alphas, X_old, U_old, uff, K)
    got = linesearch_costs_pallas(sys_, x0, alphas, X_old, U_old, uff, K,
                                  interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
