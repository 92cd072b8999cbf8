"""iLQG (stochastic trajectory optimization, ilqr_tpu.ilqg).

Oracles: certainty equivalence under additive noise; an independent
numpy/einsum implementation of the noise-aware backward recursion; gain
attenuation ("cautious control") under control-multiplicative noise; and a
Monte-Carlo closed-loop comparison against the deterministic policy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.ilqg import (
    additive_noise,
    control_multiplicative_noise,
    noise_expansion,
    simulate_closed_loop,
)
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.riccati import backward_pass


def _pendulum(d=0.1):
    return it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                            R=0.1 * jnp.eye(1), Q_f=10.0 * jnp.eye(2),
                            d=d, integrator="rk4")


def _pendulum_expansion(N=160):
    sys_ = _pendulum()
    U = 0.4 * jnp.sin(jnp.linspace(0, 5.0, N))[:, None]
    X, _ = it.rollout(sys_, jnp.array([0.5, 0.0]), U)
    return sys_, X, U, linearize_trajectory(sys_, X, U)


def test_additive_noise_certainty_equivalence():
    """Constant C ⇒ C_x = C_u = 0 ⇒ gains identical to deterministic iLQR."""
    _, X, U, exp = _pendulum_expansion()
    nexp = noise_expansion(additive_noise(jnp.array([[0.0], [0.3]])), X, U)
    np.testing.assert_allclose(nexp.C_x, 0.0)
    np.testing.assert_allclose(nexp.C_u, 0.0)
    u_d, K_d, dV_d, _ = backward_pass(exp, 0.0)
    u_n, K_n, dV_n, ok = backward_pass(exp, 0.0, noise=tuple(nexp))
    assert bool(ok)
    np.testing.assert_allclose(u_n, u_d, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(K_n, K_d, rtol=1e-6, atol=1e-6)


def _oracle_backward(exp, C, C_x, C_u):
    """Independent numpy/einsum noise-aware Riccati recursion."""
    f_x, f_u = np.asarray(exp.f_x), np.asarray(exp.f_u)
    l_x, l_u = np.asarray(exp.l_x), np.asarray(exp.l_u)
    l_xx, l_ux, l_uu = map(np.asarray, (exp.l_xx, exp.l_ux, exp.l_uu))
    V_x, V_xx = np.asarray(exp.v_x), np.asarray(exp.v_xx)
    N = f_x.shape[0]
    u_ff = np.zeros_like(l_u)
    K = np.zeros((N,) + (l_u.shape[1], l_x.shape[1]))
    for k in reversed(range(N)):
        Q_x = l_x[k] + f_x[k].T @ V_x
        Q_u = l_u[k] + f_u[k].T @ V_x
        Q_xx = l_xx[k] + f_x[k].T @ V_xx @ f_x[k]
        Q_ux = l_ux[k] + f_u[k].T @ V_xx @ f_x[k]
        Q_uu = l_uu[k] + f_u[k].T @ V_xx @ f_u[k]
        Vc = V_xx @ C[k]
        Q_u = Q_u + np.einsum("aij,ai->j", C_u[k], Vc)
        Q_x = Q_x + np.einsum("aij,ai->j", C_x[k], Vc)
        Q_uu = Q_uu + np.einsum("aij,ab,bik->jk", C_u[k], V_xx, C_u[k])
        Q_ux = Q_ux + np.einsum("aij,ab,bik->jk", C_u[k], V_xx, C_x[k])
        Q_xx = Q_xx + np.einsum("aij,ab,bik->jk", C_x[k], V_xx, C_x[k])
        K[k] = -np.linalg.solve(Q_uu, Q_ux)
        u_ff[k] = -np.linalg.solve(Q_uu, Q_u)
        V_x = Q_x + K[k].T @ Q_u
        V_xx = Q_xx + Q_ux.T @ K[k]
    return u_ff, K


def test_noise_terms_match_einsum_oracle():
    """The reshape-based _noise_q_terms equals the einsum definition, via a
    state+control-dependent noise model exercising every term."""
    sys_, X, U, exp = _pendulum_expansion(N=60)

    def noise_fn(x, u):
        # (n_x=2, n_w=2): column 0 grows with the control, column 1 with θ̇.
        return jnp.stack(
            [jnp.array([0.0, 0.2]) * u[0], jnp.array([0.05, 0.1]) * x[1]],
            axis=1,
        )

    nexp = noise_expansion(noise_fn, X, U)
    u_n, K_n, _, ok = backward_pass(exp, 0.0, noise=tuple(nexp))
    assert bool(ok)
    u_o, K_o = _oracle_backward(exp, np.asarray(nexp.C),
                                np.asarray(nexp.C_x), np.asarray(nexp.C_u))
    np.testing.assert_allclose(u_n, u_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(K_n, K_o, rtol=1e-4, atol=1e-5)


def test_control_multiplicative_noise_gives_cautious_gains():
    """Effort-proportional noise inflates Q_uu ⇒ smaller feedback gains."""
    _, X, U, exp = _pendulum_expansion()
    B = jnp.array([[0.0], [1.0]])
    u_d, K_d, _, _ = backward_pass(exp, 0.0)
    nexp = noise_expansion(control_multiplicative_noise(2.0, B), X, U)
    u_n, K_n, _, ok = backward_pass(exp, 0.0, noise=tuple(nexp))
    assert bool(ok)
    assert float(jnp.max(jnp.abs(K_n))) < float(jnp.max(jnp.abs(K_d)))
    assert float(jnp.linalg.norm(K_n)) < 0.9 * float(jnp.linalg.norm(K_d))


def test_solve_with_noise_converges_and_beats_deterministic_policy():
    """End-to-end: IlqrConfig(noise=…) swing-up converges; under the actual
    stochastic dynamics its policy does not lose to the deterministic one."""
    sys_ = _pendulum()
    B = jnp.array([[0.0], [1.0]])
    noise_fn = control_multiplicative_noise(1.5, B)
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((200, 1))

    sol_det = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=80, tol=1e-7))
    sol_sto = it.solve(sys_, x0, U0,
                       it.IlqrConfig(maxiter=80, tol=1e-7, noise=noise_fn))
    assert int(sol_sto.status) == 1
    assert np.isfinite(float(sol_sto.cost))

    key = jax.random.PRNGKey(0)
    mean_det, _ = simulate_closed_loop(
        sys_, noise_fn, sol_det.X, sol_det.U, sol_det.K, key, n_rollouts=64)
    mean_sto, _ = simulate_closed_loop(
        sys_, noise_fn, sol_sto.X, sol_sto.U, sol_sto.K, key, n_rollouts=64)
    # Under σ=1.5 effort noise the deterministic swing-up policy DIVERGES
    # (non-finite Monte-Carlo cost) while the cautious iLQG policy stays
    # bounded — treat a diverged policy as infinitely bad.
    assert np.isfinite(float(mean_sto))
    det = float(mean_det) if np.isfinite(float(mean_det)) else np.inf
    assert float(mean_sto) <= 1.05 * det


def test_noise_composes_with_parallel_backward():
    # Allowed since the frozen-value parallel form landed; the noise terms
    # ride the same fixed-point sweeps as DDP — including combined with
    # control limits since round 3 (tests/test_limited_parallel.py).
    it.IlqrConfig(noise=lambda x, u: jnp.zeros((2, 1)), backward="pscan")
    it.IlqrConfig(noise=lambda x, u: jnp.zeros((2, 1)), backward="pscan",
                  u_min=-1.0, u_max=1.0)


def test_parallel_noise_backward_matches_sequential():
    from ilqr_tpu.ops.linearize import linearize_trajectory
    from ilqr_tpu.ops.parallel_riccati import backward_pass_ddp_parallel
    from ilqr_tpu.ops.riccati import backward_pass
    from ilqr_tpu.ops.rollout import rollout

    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                            Q_f=10.0 * jnp.eye(2), d=0.1, integrator="rk4")
    x0 = jnp.array([1.0, 0.0])
    U = 0.5 * jnp.sin(jnp.linspace(0, 6, 300))[:, None]
    X, _ = rollout(sys_, x0, U)
    exp = linearize_trajectory(sys_, X, U)
    nf = control_multiplicative_noise(0.5, jnp.array([[0.0], [1.0]]))
    nz = tuple(noise_expansion(nf, X, U))
    u1, K1, _, _ = backward_pass(exp, 0.0, noise=nz)
    u2, K2, _, ok = backward_pass_ddp_parallel(exp, 0.0, noise=nz, sweeps=6)
    assert bool(ok)
    np.testing.assert_allclose(np.array(u2), np.array(u1), atol=1e-4)
    np.testing.assert_allclose(np.array(K2), np.array(K1), atol=1e-4)
