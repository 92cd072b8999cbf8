"""Pallas Riccati kernels, heavier interpret-mode cases (double-pendulum
gains, extended-dimension QR path).  Split from test_pallas_riccati.py to
balance xdist workers — interpret mode dominates these tests' runtime."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.pallas_riccati import (
    backward_pass_pallas,
    backward_pass_pallas_fused,
)
from ilqr_tpu.ops.riccati import backward_pass


def test_pallas_gains_match_sequential_double_pendulum():
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0, 0, 0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([10.0, 10.0, 1.0, 1.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    N = 64  # interpret mode is slow; keep horizons small
    U = 0.3 * jnp.cos(jnp.linspace(0, 3.0, N))[:, None] * jnp.ones((1, 2))
    X, _ = it.rollout(sys_, jnp.zeros(4), U)
    exp = linearize_trajectory(sys_, X, U)
    u_s, K_s, _, _ = backward_pass(exp)
    u_p, K_p, _, ok = backward_pass_pallas(exp, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(u_p, u_s, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-3, atol=1e-3)
    u_f, K_f, _, ok_f = backward_pass_pallas_fused(exp, interpret=True)
    assert bool(ok_f)
    np.testing.assert_allclose(u_f, u_s, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(K_f, K_s, rtol=2e-3, atol=2e-3)


def test_fused_backward_extended_dims_n5():
    """Extended-dimension path (5 <= n_x <= 8, row-symbolic Householder-QR
    inverses): gains match the sequential backward.  Only n_x=5, n_u=2 runs
    in interpret mode (larger dims are minutes-slow interpreted); n_x=6/8 and
    n_u=6 are validated on the real chip (NOTES.md r2: <= 2e-6 rel, incl. a
    stiff Q_f=1000 terminal)."""
    import jax.numpy as jnp
    from ilqr_tpu.ops.linearize import TrajectoryExpansion
    from ilqr_tpu.ops.riccati import backward_pass

    n_x, n_u, N = 5, 2, 40
    ks = jax.random.split(jax.random.PRNGKey(52), 8)
    W = jax.random.normal(ks[4], (N, n_x, n_x)) * 0.05
    Wu = jax.random.normal(ks[6], (N, n_u, n_u)) * 0.05
    exp = TrajectoryExpansion(
        f_x=jnp.eye(n_x) + 0.02 * jax.random.normal(ks[0], (N, n_x, n_x)),
        f_u=0.02 * jax.random.normal(ks[1], (N, n_x, n_u)),
        l_x=0.01 * jax.random.normal(ks[2], (N, n_x)),
        l_u=0.01 * jax.random.normal(ks[3], (N, n_u)),
        l_xx=0.01 * jnp.eye(n_x) + W @ jnp.swapaxes(W, -1, -2),
        l_ux=0.002 * jax.random.normal(ks[5], (N, n_u, n_x)),
        l_uu=0.01 * jnp.eye(n_u) + Wu @ jnp.swapaxes(Wu, -1, -2),
        v_x=0.1 * jax.random.normal(ks[7], (n_x,)),
        v_xx=10.0 * jnp.eye(n_x),
    )
    u_ref, K_ref, _, _ = backward_pass(exp, 0.0)
    u_p, K_p, _, ok = backward_pass_pallas_fused(exp, 0.0, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_ref),
                               rtol=1e-4, atol=1e-5)
