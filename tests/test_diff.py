"""Implicit differentiation (ilqr_tpu.diff) — gradient correctness.

Oracles:
  * central finite differences of the full (tightly converged) solve;
  * reverse-mode through an UNROLLED fixed-iteration iLQR (differentiable
    because it avoids while_loop) — at convergence its gradient must agree
    with the IFT gradient, and in f32 this comparison is far sharper than FD;
  * the envelope theorem: d(cost*)/dθ equals the direct ∂J/∂θ at fixed U*.

Closed-loop (MPC) and learning tests live in test_diff_closedloop.py so
pytest-xdist can run the two files on separate workers.
"""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it
from ilqr_tpu.diff import IftConfig, solve_implicit
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.riccati import backward_pass
from ilqr_tpu.ops.rollout import closed_loop_rollout, rollout


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    # The reverse-mode programs here (unrolled solver grads, CG inside a
    # custom_vjp) are among the largest in the suite; on this jaxlib XLA:CPU
    # codegen segfaults once enough compiled state accumulates in one process
    # (NOTES.md).  Per-TEST cache clearing keeps this module safely below the
    # threshold — the module-scoped conftest fixture is not enough here.
    yield
    jax.clear_caches()


def _pendulum(r_scale=1.0, q_scale=1.0):
    return it.make_pendulum(
        0.05, [jnp.pi, 0.0],
        Q=q_scale * jnp.eye(2), R=r_scale * jnp.eye(1), Q_f=10.0 * jnp.eye(2),
        integrator="rk4",
    )


N = 40
CFG = it.IlqrConfig(maxiter=200, tol=1e-9)
X0 = jnp.array([0.3, 0.0])
U0 = jnp.zeros((N, 1))


def _unrolled_solve(system, x0, U, iters=30):
    """Fixed-iteration iLQR with α=1 (differentiable: scan only, no cond)."""

    def body(U, _):
        X, _ = rollout(system, x0, U)
        exp = linearize_trajectory(system, X, U)
        u_ff, K, _, _ = backward_pass(exp, 0.0)
        _, U_new, _ = closed_loop_rollout(system, x0, jnp.asarray(1.0), X, U, u_ff, K)
        return U_new, None

    U, _ = jax.lax.scan(body, U, None, length=iters)
    X, cost = rollout(system, x0, U)
    return X, U, cost


def test_cost_gradient_matches_finite_differences():
    def cost_of(r):
        sol = solve_implicit(_pendulum(r_scale=r), X0, U0, CFG)
        return sol.cost

    r0 = 1.0
    g = jax.grad(cost_of)(r0)
    eps = 1e-2
    fd = (cost_of(r0 + eps) - cost_of(r0 - eps)) / (2 * eps)
    assert jnp.isfinite(g)
    assert abs(g - fd) <= 2e-2 * max(abs(fd), 1.0)


def test_gradients_match_unrolled_autodiff():
    # Loss depends on U* and X* (not just cost*), exercising the implicit CG
    # solve; joint grad w.r.t. a cost weight AND x0 in one program.
    def loss_ift(q, x0):
        sol = solve_implicit(_pendulum(q_scale=q), x0, U0, CFG)
        return jnp.sum(sol.U**2) + jnp.sum(sol.X[-1] ** 2)

    def loss_unrolled(q, x0):
        X, U, _ = _unrolled_solve(_pendulum(q_scale=q), x0, U0)
        return jnp.sum(U**2) + jnp.sum(X[-1] ** 2)

    gq_ift, gx_ift = jax.grad(loss_ift, argnums=(0, 1))(1.0, X0)
    gq_unr, gx_unr = jax.grad(loss_unrolled, argnums=(0, 1))(1.0, X0)
    assert jnp.isfinite(gq_ift) and jnp.all(jnp.isfinite(gx_ift))
    # IFT vs unrolled agreement is limited by how exactly the f32 solve sits
    # at its stationary point; the round-3 value-update re-lowering moved
    # this from 5.0e-3 to 5.1e-3 relative (same math, different f32
    # summation order), so the gate is 1e-2 — still far sharper than the
    # ~2e-2 finite-difference noise floor (NOTES).
    assert abs(gq_ift - gq_unr) <= 1e-2 * max(abs(gq_unr), 1.0)
    assert jnp.allclose(gx_ift, gx_unr, rtol=5e-3, atol=1e-4)


def test_gradients_match_unrolled_autodiff_f64():
    """f64 companion to the 1e-2 f32 gate above (VERDICT r3 item 8): the
    f32 tolerance absorbs summation-order noise, so this pins the REAL
    IFT-vs-unrolled agreement at double precision, where the solve sits
    sharply on its stationary point."""
    from ilqr_tpu.utils.x64 import enable_x64_oracle

    with enable_x64_oracle():
        x0 = jnp.array([0.3, 0.0], dtype=jnp.float64)
        u0 = jnp.zeros((N, 1), dtype=jnp.float64)

        def loss_ift(q, x0):
            sol = solve_implicit(_pendulum(q_scale=q), x0, u0, CFG)
            return jnp.sum(sol.U**2) + jnp.sum(sol.X[-1] ** 2)

        def loss_unrolled(q, x0):
            X, U, _ = _unrolled_solve(_pendulum(q_scale=q), x0, u0)
            return jnp.sum(U**2) + jnp.sum(X[-1] ** 2)

        gq_ift, gx_ift = jax.grad(loss_ift, argnums=(0, 1))(
            jnp.float64(1.0), x0)
        gq_unr, gx_unr = jax.grad(loss_unrolled, argnums=(0, 1))(
            jnp.float64(1.0), x0)
        assert abs(gq_ift - gq_unr) <= 2e-3 * max(abs(gq_unr), 1.0)
        assert jnp.allclose(gx_ift, gx_unr, rtol=2e-3, atol=1e-6)


def test_envelope_theorem():
    # d(cost*)/dθ must equal the direct partial ∂J/∂θ at the fixed optimum
    # (the implicit term vanishes because ∇_U J(U*) = 0).
    sys_ = _pendulum()
    sol = it.solve(sys_, X0, U0, CFG)
    U_star = sol.U

    def cost_ift(q):
        return solve_implicit(_pendulum(q_scale=q), X0, U0, CFG).cost

    def cost_direct(q):
        return rollout(_pendulum(q_scale=q), X0, U_star)[1]

    g_ift = jax.grad(cost_ift)(1.0)
    g_env = jax.grad(cost_direct)(1.0)
    assert abs(g_ift - g_env) <= 1e-3 * max(abs(g_env), 1.0)


def test_rejects_control_limits():
    with pytest.raises(ValueError):
        solve_implicit(
            _pendulum(), X0, U0, it.IlqrConfig(u_min=-1.0, u_max=1.0)
        )


def test_forward_matches_plain_solve():
    sys_ = _pendulum()
    a = it.solve(sys_, X0, U0, CFG)
    b = solve_implicit(sys_, X0, U0, CFG)
    assert jnp.allclose(a.U, b.U) and jnp.allclose(a.cost, b.cost)
