"""Closed-form small-matrix solves vs LAPACK-backed jnp.linalg oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.ops.smallmat import inv2, inv3, inv4, inv_small, solve_small


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 8])
def test_inverse_matches_linalg(n):
    key = jax.random.PRNGKey(n)
    A = jax.random.normal(key, (64, n, n)) * 0.5 + jnp.eye(n)
    got = inv_small(A)
    want = jnp.linalg.inv(A)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 8, 9])
def test_solve_matrix_rhs(n):
    key = jax.random.PRNGKey(10 + n)
    A = jax.random.normal(key, (8, n, n)) * 0.3 + 2.0 * jnp.eye(n)
    B = jax.random.normal(jax.random.PRNGKey(99), (8, n, n + 1))
    X = solve_small(A, B)
    np.testing.assert_allclose(A @ X, B, atol=2e-4)


@pytest.mark.parametrize("n", [2, 4])
def test_solve_vector_rhs(n):
    A = jax.random.normal(jax.random.PRNGKey(n), (n, n)) * 0.3 + 2.0 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(0), (n,))
    x = solve_small(A, b)
    assert x.shape == (n,)
    np.testing.assert_allclose(A @ x, b, atol=1e-4)


def test_grad_flows_through_solve():
    A = 2.0 * jnp.eye(2) + 0.1
    b = jnp.array([1.0, -1.0])
    g = jax.grad(lambda a: jnp.sum(solve_small(a, b)))(A)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.linalg.solve(a, b)))(A)
    np.testing.assert_allclose(g, g_ref, rtol=1e-4)


def test_spd_conditioning_6x6_block_schur():
    # n=5..8 path (4+(n−4) block Schur over the closed forms): SPD with
    # spread eigenvalues, quadrotor-n_x-sized.
    vals = jnp.array([1e-2, 0.1, 1.0, 5.0, 50.0, 100.0])
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(7), (6, 6)))
    A = Q @ jnp.diag(vals) @ Q.T
    x = solve_small(A, jnp.ones(6))
    np.testing.assert_allclose(A @ x, jnp.ones(6), atol=1e-2)


def test_spd_conditioning_4x4():
    # Schur-complement block inversion must handle SPD matrices with spread
    # eigenvalues (Q_uu-like, up to cond ~1e4 in fp32).
    vals = jnp.array([1e-2, 0.1, 10.0, 100.0])
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(5), (4, 4)))
    A = Q @ jnp.diag(vals) @ Q.T
    x = solve_small(A, jnp.ones(4))
    np.testing.assert_allclose(A @ x, jnp.ones(4), atol=1e-2)
