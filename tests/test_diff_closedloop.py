"""Differentiable solve — closed-loop MPC gradients and learning loops.

Split from test_diff.py so pytest-xdist schedules the heavy reverse-mode
compiles of the two files on separate workers.
"""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it
from ilqr_tpu.diff import run_mpc_implicit, solve_implicit


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    # See test_diff.py: big reverse-mode programs + the XLA:CPU cumulative
    # compile-state segfault (NOTES.md) → clear per test.
    yield
    jax.clear_caches()


def _pendulum(r_scale=1.0):
    return it.make_pendulum(
        0.05, [jnp.pi, 0.0],
        Q=jnp.eye(2), R=r_scale * jnp.eye(1), Q_f=10.0 * jnp.eye(2),
        integrator="rk4",
    )


X0 = jnp.array([0.3, 0.0])
CFG = it.IlqrConfig(maxiter=200, tol=1e-9)


def test_jit_grad_compiles_and_vmaps():
    sys_ = _pendulum()
    U0 = jnp.zeros((30, 1))

    def loss(x0):
        sol = solve_implicit(sys_, x0, U0, it.IlqrConfig(maxiter=30, tol=1e-8))
        return sol.cost + 1e-3 * jnp.sum(sol.U**2)

    g = jax.jit(jax.grad(loss))(X0)
    assert g.shape == X0.shape and jnp.all(jnp.isfinite(g))
    gs = jax.jit(jax.vmap(jax.grad(loss)))(jnp.stack([X0, X0 + 0.1]))
    assert gs.shape == (2, 2) and jnp.all(jnp.isfinite(gs))
    assert jnp.allclose(gs[0], g, rtol=1e-4, atol=1e-6)


def test_inverse_optimal_control_recovers_weight():
    # Demonstrations generated with R=0.3; gradient descent on the control
    # log-weight must move a wrong initial guess toward the truth.
    r_true = 0.3
    U0 = jnp.zeros((40, 1))
    demo = it.solve(_pendulum(r_scale=r_true), X0, U0, CFG)

    def loss(log_r):
        sol = solve_implicit(_pendulum(r_scale=jnp.exp(log_r)), X0, U0, CFG)
        return jnp.mean((sol.U - demo.U) ** 2)

    log_r = jnp.log(1.5)
    vg_fn = jax.jit(jax.value_and_grad(loss))
    val, g = vg_fn(log_r)
    val0, lr = val, 2.0
    for _ in range(20):
        # Backtracked gradient step (the raw landscape is stiff for small r:
        # a fixed step size diverges).
        cand = log_r - lr * g
        val_c, g_c = vg_fn(cand)
        if val_c < val:
            log_r, val, g = cand, val_c, g_c
            lr = min(lr * 1.5, 4.0)
        else:
            lr *= 0.3
    assert val < 0.05 * val0
    assert abs(jnp.exp(log_r) - r_true) < 0.15


def test_mpc_implicit_gradient_matches_fd():
    # Closed-loop weight tuning: gradient of realized plant cost w.r.t. the
    # SOLVER's control weight, under solver/plant integrator mismatch.
    plant = _pendulum().with_integrator("midpoint")
    cfg = it.IlqrConfig(maxiter=40, tol=1e-9)
    U0 = jnp.zeros((12, 1))

    def closed_loop_cost(r):
        _, _, cost = run_mpc_implicit(
            _pendulum(r_scale=r), plant, X0, U0, 8, cfg
        )
        return cost

    g = jax.grad(closed_loop_cost)(1.0)
    eps = 1e-2
    fd = (closed_loop_cost(1.0 + eps) - closed_loop_cost(1.0 - eps)) / (2 * eps)
    assert jnp.isfinite(g)
    assert abs(g - fd) <= 5e-2 * max(abs(fd), 1e-2)
