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
    if n >= 5:
        # QR path: backward stable, so the error bound is ~cond(A)*eps32
        # against an f64 oracle (tighter than comparing two f32 codes).
        A64 = np.asarray(A, np.float64)
        want64 = np.linalg.inv(A64)
        cond = np.linalg.cond(A64)
        relerr = (np.abs(np.asarray(got, np.float64) - want64).max(axis=(-2, -1))
                  / np.abs(want64).max(axis=(-2, -1)))
        bound = 20.0 * cond * np.finfo(np.float32).eps
        assert (relerr <= bound).all(), (relerr / bound).max()
    else:
        want = jnp.linalg.inv(A)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n", [5, 6, 7, 8])
def test_inverse_qr_adversarial_illconditioned(n):
    """The round-1 failure mode: leading 4x4 block ill-conditioned relative
    to A.  Householder QR must keep the error at ~cond(A)*eps32."""
    key = jax.random.PRNGKey(100 + n)
    ks = jax.random.split(key, 3)
    # Random orthogonal factors, controlled singular values: cond(A) = 1e4,
    # with the SMALL singular directions concentrated in the leading block.
    U, _ = jnp.linalg.qr(jax.random.normal(ks[0], (32, n, n)))
    V, _ = jnp.linalg.qr(jax.random.normal(ks[1], (32, n, n)))
    svals = jnp.logspace(-4, 0, n)  # cond = 1e4
    A = U @ (svals[:, None] * jnp.swapaxes(V, -1, -2))
    got = inv_small(A)
    want = jnp.linalg.inv(A.astype(jnp.float64) if jax.config.jax_enable_x64
                          else A)
    relerr = jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want))
    # cond*eps32 = 1e4 * 1.2e-7 ~ 1.2e-3; allow a modest stability factor.
    assert float(relerr) < 5e-3, float(relerr)
    # Residual check: A @ X ~ I to backward-stable accuracy.
    I = jnp.eye(n)
    res = jnp.max(jnp.abs(A @ got - I))
    assert float(res) < 5e-3, float(res)


@pytest.mark.parametrize("n", [5, 6, 7, 8])
def test_inverse_qr_leading_block_singular(n):
    """Leading 4x4 block EXACTLY singular — block-Schur would divide by zero;
    QR with implicit row interchanges (via reflectors) handles it."""
    key = jax.random.PRNGKey(200 + n)
    A = jax.random.normal(key, (n, n)) + 2.0 * jnp.eye(n)
    A = A.at[0, :].set(A[1, :])  # rows 0,1 identical -> leading 2x2 singular
    A = A.at[0, n - 1].add(3.0)  # but A itself nonsingular
    got = inv_small(A)
    np.testing.assert_allclose(A @ got, jnp.eye(n), atol=1e-4)


def test_inverse_qr_triangular_input():
    """Already-triangular input exercises the zero-reflector guard."""
    A = jnp.triu(jnp.ones((6, 6))) + jnp.diag(jnp.arange(1.0, 7.0))
    got = inv_small(A)
    np.testing.assert_allclose(A @ got, jnp.eye(6), atol=1e-5)


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


def test_spd_conditioning_6x6():
    # n=5..8 QR path: SPD with spread eigenvalues, quadrotor-n_x-sized.
    vals = jnp.array([1e-2, 0.1, 1.0, 5.0, 50.0, 100.0])
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(7), (6, 6)))
    A = Q @ jnp.diag(vals) @ Q.T
    x = solve_small(A, jnp.ones(6))
    # cond(A) = 1e4: forward error vs an f64 oracle must stay well under
    # cond*eps32 (= 1.2e-3); measured ~2e-5 for the QR path.
    x64 = np.linalg.solve(np.asarray(A, np.float64), np.ones(6))
    relerr = np.abs(np.asarray(x, np.float64) - x64).max() / np.abs(x64).max()
    assert relerr < 2e-4, relerr


def test_grad_flows_through_qr_path():
    A = 2.0 * jnp.eye(6) + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (6, 6))
    b = jnp.ones(6)
    g = jax.grad(lambda a: jnp.sum(solve_small(a, b)))(A)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.linalg.solve(a, b)))(A)
    np.testing.assert_allclose(g, g_ref, rtol=1e-3, atol=1e-5)


def test_quadrotor_solve_vs_f64_oracle():
    """Quadrotor (n_x=6) rides inv_small's 5<=n<=8 path in every Q_uu /
    implicit-integrator solve.  Validate the converged f32 solve against an
    f64 CPU oracle (same algorithm run at double precision)."""
    import ilqr_tpu as it
    from ilqr_tpu.utils.x64 import enable_x64_oracle

    def build_and_solve(dtype):
        Q = jnp.asarray(np.diag([10.0, 10.0, 1.0, 1.0, 1.0, 1.0]), dtype)
        R = jnp.asarray(0.1 * np.eye(2), dtype)
        Qf = jnp.asarray(np.diag([100.0] * 3 + [10.0] * 3), dtype)
        sys_ = it.make_quadrotor(0.02, jnp.asarray([1.0, 1.0, 0, 0, 0, 0], dtype),
                                 Q=Q, R=R, Q_f=Qf, integrator="rk4")
        from ilqr_tpu.models.quadrotor import hover_controls
        U0 = jnp.tile(hover_controls(sys_.params).astype(dtype), (100, 1))
        x0 = jnp.zeros(6, dtype)
        # tol below either precision's resolution: both run until the line
        # search can no longer improve, so the comparison is algorithm-
        # matched (a convergence-tolerance stop would trigger at different
        # iterations in f32 vs f64 and compare different iterates).
        return it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=30, tol=1e-30))

    sol32 = build_and_solve(jnp.float32)
    with enable_x64_oracle():
        sol64 = build_and_solve(jnp.float64)
        cost64 = float(sol64.cost)
        X64 = np.asarray(sol64.X)
    assert abs(float(sol32.cost) - cost64) / abs(cost64) < 1e-4
    np.testing.assert_allclose(np.asarray(sol32.X), X64, atol=2e-3)


def test_spd_conditioning_4x4():
    # Schur-complement block inversion must handle SPD matrices with spread
    # eigenvalues (Q_uu-like, up to cond ~1e4 in fp32).
    vals = jnp.array([1e-2, 0.1, 10.0, 100.0])
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(5), (4, 4)))
    A = Q @ jnp.diag(vals) @ Q.T
    x = solve_small(A, jnp.ones(4))
    np.testing.assert_allclose(A @ x, jnp.ones(4), atol=1e-2)
