"""Chunked (multiple-shooting) parallel line-search rollouts.

The chunked rollout must reproduce the exact sequential line search
(`ops/rollout.py::linesearch_rollouts`, reference semantics
`iLQR_class.py:164-247`) up to its certified boundary defect, and the
solver's rollout='chunked' mode must reach the same optima as the
sequential path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.models.cartpole import make_cartpole
from ilqr_tpu.ops.chunked_rollout import (
    auto_chunk_len,
    chunk_transition_products,
    chunked_rollout,
    coarse_chunk_len,
    linesearch_chunked_rollouts,
)
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.riccati import backward_pass
from ilqr_tpu.ops.rollout import linesearch_rollouts, rollout


def _pendulum(integrator="rk4", d=0.0):
    return it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                            Q_f=jnp.zeros((2, 2)), d=d, integrator=integrator)


def _ls_inputs(sys_, x0, N, n_u=1):
    U = 0.3 * jnp.sin(jnp.linspace(0, 8, N))[:, None] * jnp.ones((1, n_u))
    X, _ = rollout(sys_, x0, U)
    exp = linearize_trajectory(sys_, X, U)
    u_ff, K, _, _ = backward_pass(exp, 0.0)
    A_cl = exp.f_x + exp.f_u @ K
    return X, U, u_ff, K, A_cl


def test_chunk_transition_products_match_dense_product():
    key = jax.random.PRNGKey(0)
    A = 0.3 * jax.random.normal(key, (12, 3, 3)) + jnp.eye(3)
    Phi = chunk_transition_products(A, 4)
    for c in range(3):
        want = jnp.eye(3)
        for k in range(4):
            want = A[c * 4 + k] @ want
        np.testing.assert_allclose(np.array(Phi[c]), np.array(want),
                                   rtol=1e-6, atol=1e-6)


def test_auto_chunk_len_bounds():
    assert auto_chunk_len(100) == 16
    assert auto_chunk_len(10_000) == 100
    assert auto_chunk_len(1_000_000) == 512


def test_coarse_chunk_len_bounds():
    assert coarse_chunk_len(100) == 128
    assert coarse_chunk_len(10_000) == 800
    assert coarse_chunk_len(1_000_000) == 4096


def test_coarse_chunks_certify_aggressive_candidate():
    """The phase-2 robustness property: on a drift-prone system the α=1
    candidate's boundary Newton diverges at the fine chunk length but
    certifies at the coarse one (this is why the solver's phase 2 pays the
    deeper scan)."""
    N = 4096
    cp = make_cartpole(
        0.0005, [0.0, jnp.pi, 0.0, 0.0],
        Q=jnp.diag(jnp.array([1.0, 5.0, 0.1, 0.1])), R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([100.0, 500.0, 50.0, 50.0])))
    x0 = jnp.zeros(4)
    U = jnp.zeros((N, 1))
    X, _ = rollout(cp, x0, U)
    exp = linearize_trajectory(cp, X, U)
    u_ff, K, _, _ = backward_pass(exp, 0.0)
    A_cl = exp.f_x + exp.f_u @ K
    al = jnp.asarray([1.0])
    _, _, _, d_fine = linesearch_chunked_rollouts(
        cp, x0, al, X, U, u_ff, K, A_cl, sweeps=8,
        chunk_len=auto_chunk_len(N))
    _, _, _, d_coarse = linesearch_chunked_rollouts(
        cp, x0, al, X, U, u_ff, K, A_cl, sweeps=8,
        chunk_len=coarse_chunk_len(N))
    assert float(d_fine[0]) > 0.1      # fine scheme diverged (measured 0.99)
    assert float(d_coarse[0]) < 1e-5   # coarse certifies


@pytest.mark.parametrize("N,chunk_len", [(400, 0), (400, 32), (97, 24)])
def test_linesearch_matches_sequential(N, chunk_len):
    sys_ = _pendulum()
    x0 = jnp.array([1.0, 0.0])
    X, U, u_ff, K, A_cl = _ls_inputs(sys_, x0, N)
    alphas = jnp.asarray([0.5 ** i for i in range(10)])

    Xs, Us, cs = linesearch_rollouts(sys_, x0, alphas, X, U, u_ff, K)
    Xc, Uc, cc, dd = linesearch_chunked_rollouts(
        sys_, x0, alphas, X, U, u_ff, K, A_cl, sweeps=6,
        chunk_len=chunk_len, exit_tol=1e-7)
    # Small-α candidates stay near the linearization point: boundary Newton
    # converges and the assembled trajectories match the exact rollouts.
    for a in range(3, 10):
        assert float(dd[a]) < 1e-4
        np.testing.assert_allclose(float(cc[a]), float(cs[a]), rtol=1e-4)
        np.testing.assert_allclose(np.array(Xc[a]), np.array(Xs[a]),
                                   atol=5e-4)


def test_single_candidate_matches_multi():
    sys_ = _pendulum()
    x0 = jnp.array([1.0, 0.0])
    X, U, u_ff, K, A_cl = _ls_inputs(sys_, x0, 200)
    alphas = jnp.asarray([0.25])
    Xm, Um, cm, dm = linesearch_chunked_rollouts(
        sys_, x0, alphas, X, U, u_ff, K, A_cl, sweeps=5)
    X1, U1, c1, d1 = chunked_rollout(
        sys_, x0, 0.25, X, U, u_ff, K, A_cl, sweeps=5)
    np.testing.assert_allclose(np.array(X1), np.array(Xm[0]), atol=1e-6)
    assert float(c1) == pytest.approx(float(cm[0]))


def test_control_limits_clamped_exactly():
    sys_ = _pendulum()
    x0 = jnp.array([1.0, 0.0])
    X, U, u_ff, K, A_cl = _ls_inputs(sys_, x0, 300)
    alphas = jnp.asarray([0.5 ** i for i in range(6)])
    lim = (jnp.array([-0.2]), jnp.array([0.2]))
    Xs, Us, cs = linesearch_rollouts(sys_, x0, alphas, X, U, u_ff, K,
                                     u_limits=lim)
    Xc, Uc, cc, dd = linesearch_chunked_rollouts(
        sys_, x0, alphas, X, U, u_ff, K, A_cl, sweeps=6, exit_tol=1e-7,
        u_limits=lim)
    assert float(jnp.max(jnp.abs(Uc))) <= 0.2 + 1e-6
    for a in range(2, 6):
        np.testing.assert_allclose(float(cc[a]), float(cs[a]), rtol=1e-4)


def test_vmap_over_initial_states():
    sys_ = _pendulum()
    x0 = jnp.array([1.0, 0.0])
    X, U, u_ff, K, A_cl = _ls_inputs(sys_, x0, 128)
    alphas = jnp.asarray([1.0, 0.5, 0.25])
    x0s = jnp.stack([x0, x0 + 0.01])
    costs = jax.jit(jax.vmap(lambda xx: linesearch_chunked_rollouts(
        sys_, xx, alphas, X, U, u_ff, K, A_cl, sweeps=3)[2]))(x0s)
    assert costs.shape == (2, 3)
    assert bool(jnp.all(jnp.isfinite(costs)))


def test_solver_chunked_matches_scan_pendulum():
    sys_ = _pendulum(integrator="backward_euler")
    x0, U0 = jnp.array([1.0, 0.0]), jnp.zeros((400, 1))
    a = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-5,
                                             rollout="scan"))
    b = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-5,
                                             rollout="chunked"))
    assert int(b.status) == 1
    # Reference golden: 23.435774 (tests/test_solver.py parity suite).
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-5)


def test_solver_chunked_matches_scan_cartpole():
    cp = make_cartpole(
        0.01, [0.0, jnp.pi, 0.0, 0.0],
        Q=jnp.diag(jnp.array([1.0, 5.0, 0.1, 0.1])), R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([100.0, 500.0, 50.0, 50.0])))
    x0, U0 = jnp.zeros(4), jnp.zeros((600, 1))
    a = it.solve(cp, x0, U0, it.IlqrConfig(maxiter=40, tol=1e-6,
                                           rollout="scan", adaptive_reg=True))
    b = it.solve(cp, x0, U0, it.IlqrConfig(maxiter=40, tol=1e-6,
                                           rollout="chunked",
                                           adaptive_reg=True))
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-4)


def test_solver_chunked_with_limits():
    sys_ = _pendulum(integrator="backward_euler")
    x0, U0 = jnp.array([1.0, 0.0]), jnp.zeros((400, 1))
    a = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-6,
                                             u_min=-2.0, u_max=2.0))
    b = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-6,
                                             u_min=-2.0, u_max=2.0,
                                             rollout="chunked"))
    assert float(jnp.max(jnp.abs(b.U))) <= 2.0 + 1e-6
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-4)


def test_config_accepts_chunked():
    it.IlqrConfig(rollout="chunked", chunk_len=64)
    it.IlqrConfig(u_min=-1.0, u_max=1.0, rollout="chunked")
    with pytest.raises(ValueError, match="rollout"):
        it.IlqrConfig(rollout="chunky")
