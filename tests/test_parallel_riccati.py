"""Associative-scan Riccati vs the sequential recursion — they must agree to
floating-point tolerance on the same trajectory expansion, and the solver must
converge to the same solution with backward='pscan'."""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.parallel_riccati import (
    backward_pass_associative,
    combine,
    make_elements,
)
from ilqr_tpu.ops.riccati import backward_pass


def _random_expansion(key, N=64, n_x=4, n_u=2):
    ks = jax.random.split(key, 8)
    rnd = lambda k, s: 0.1 * jax.random.normal(k, s)
    f_x = jnp.eye(n_x) + rnd(ks[0], (N, n_x, n_x))
    f_u = rnd(ks[1], (N, n_x, n_u))
    l_x = rnd(ks[2], (N, n_x))
    l_u = rnd(ks[3], (N, n_u))
    mk_pd = lambda k, n: (lambda A: A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(n))(
        rnd(k, (N, n, n))
    )
    l_xx = mk_pd(ks[4], n_x)
    l_uu = mk_pd(ks[5], n_u) + jnp.eye(n_u)
    l_ux = 0.05 * rnd(ks[6], (N, n_u, n_x))
    v_x = rnd(ks[7], (n_x,))
    v_xx = jnp.eye(n_x) * 2.0
    return it.TrajectoryExpansion(
        f_x=f_x, f_u=f_u, l_x=l_x, l_u=l_u, l_xx=l_xx, l_ux=l_ux, l_uu=l_uu,
        v_x=v_x, v_xx=v_xx,
    )


def test_combine_is_associative():
    exp = _random_expansion(jax.random.PRNGKey(3), N=3)
    e = make_elements(exp, 0.0)
    pick = lambda i: jax.tree_util.tree_map(lambda a: a[i], e)
    e0, e1, e2 = pick(0), pick(1), pick(2)
    left = combine(combine(e0, e1), e2)
    right = combine(e0, combine(e1, e2))
    for a, b in zip(left, right):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_associative_matches_sequential_random():
    exp = _random_expansion(jax.random.PRNGKey(0), N=128)
    u_ff_s, K_s, dV_s, ok_s = backward_pass(exp)
    u_ff_p, K_p, dV_p, ok_p = backward_pass_associative(exp)
    assert bool(ok_s) and bool(ok_p)
    np.testing.assert_allclose(u_ff_p, u_ff_s, atol=1e-3)
    np.testing.assert_allclose(K_p, K_s, atol=1e-3)
    np.testing.assert_allclose(dV_p, dV_s, rtol=1e-2, atol=1e-3)


def test_associative_matches_sequential_on_pendulum_trajectory():
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    N = 200
    U = 0.1 * jnp.sin(jnp.linspace(0, 6.0, N))[:, None]
    X, _ = it.rollout(sys_, jnp.array([1.0, 0.0]), U)
    exp = linearize_trajectory(sys_, X, U)
    u_ff_s, K_s, _, _ = backward_pass(exp)
    u_ff_p, K_p, _, _ = backward_pass_associative(exp)
    np.testing.assert_allclose(u_ff_p, u_ff_s, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-3, atol=1e-3)


def test_solver_with_pscan_backward_converges():
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="backward_euler")
    N = 400
    cfg_s = it.IlqrConfig(maxiter=100, tol=1e-5, backward="scan")
    cfg_p = it.IlqrConfig(maxiter=100, tol=1e-5, backward="pscan")
    x0 = jnp.array([1.0, 0.0])
    U0 = jnp.zeros((N, 1))
    sol_s = it.solve(sys_, x0, U0, cfg_s)
    sol_p = it.solve(sys_, x0, U0, cfg_p)
    np.testing.assert_allclose(float(sol_p.cost), float(sol_s.cost), rtol=1e-3)


def test_solver_with_pscan_on_stiff_double_pendulum():
    """On the stiff Q_f=1000 double pendulum, fp32 grouping noise moves
    individual near-terminal gains ~1% — the solver must still converge to an
    equivalent-quality optimum with the associative backward."""
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0, 0, 0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    x0, U0 = jnp.zeros(4), jnp.zeros((500, 2))
    cost_s = float(it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=200, tol=1e-6)).cost)
    sol_p = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=200, tol=1e-6, backward="pscan"))
    assert float(sol_p.cost) <= cost_s * 1.05
    # Both reach the upright target.
    assert abs(float(sol_p.X[-1, 0]) - np.pi) < 0.2


def test_regularized_passes_agree():
    """backward_pass_associative(exp, reg) solves the control-cost-inflated
    subproblem (l_uu + reg·I) *exactly*, so it must equal the sequential pass
    on that modified expansion with no additional regularization.  (This
    differs from sequential Q_uu-regularization by design: leaf-level reg is
    the form that keeps the scan elements associative.)"""
    exp = _random_expansion(jax.random.PRNGKey(7), N=32)
    reg = 0.3
    n_u = exp.l_uu.shape[-1]
    exp_mod = it.TrajectoryExpansion(
        f_x=exp.f_x, f_u=exp.f_u, l_x=exp.l_x, l_u=exp.l_u, l_xx=exp.l_xx,
        l_ux=exp.l_ux, l_uu=exp.l_uu + reg * jnp.eye(n_u), v_x=exp.v_x,
        v_xx=exp.v_xx,
    )
    u_ff_s, K_s, _, _ = backward_pass(exp_mod, 0.0)
    u_ff_p, K_p, _, _ = backward_pass_associative(exp, reg)
    np.testing.assert_allclose(u_ff_p, u_ff_s, atol=2e-3)
    np.testing.assert_allclose(K_p, K_s, atol=2e-3)
