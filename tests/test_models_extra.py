"""Cartpole/quadrotor model tests: physics sanity + iLQR solves them."""
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.models.cartpole import make_cartpole
from ilqr_tpu.models.quadrotor import hover_controls, make_quadrotor
from ilqr_tpu.ops.integrators import step


def test_cartpole_equilibria():
    sys_ = make_cartpole(0.01, [0.0, jnp.pi, 0.0, 0.0],
                         Q=jnp.eye(4), R=jnp.eye(1), Q_f=jnp.eye(4))
    # Hanging down with no force: stays put.
    x = jnp.zeros(4)
    np.testing.assert_allclose(step(sys_, x, jnp.zeros(1)), x, atol=1e-6)
    # Gravity accelerates the pole away from a slight offset (unstable upright).
    x_up = jnp.array([0.0, jnp.pi - 0.01, 0.0, 0.0])
    x1 = step(sys_, x_up, jnp.zeros(1))
    assert float(x1[1]) < float(x_up[1])


def test_cartpole_swingup():
    dt, T = 0.02, 3.0
    N = int(round(T / dt))
    sys_ = make_cartpole(
        dt, [0.0, jnp.pi, 0.0, 0.0],
        Q=jnp.diag(jnp.array([1.0, 5.0, 0.1, 0.1])),
        R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([100.0, 500.0, 50.0, 50.0])),
    )
    sol = it.solve(sys_, jnp.zeros(4), jnp.zeros((N, 1)),
                   it.IlqrConfig(maxiter=300, tol=1e-6, adaptive_reg=True))
    assert abs(float(sol.X[-1, 1]) - np.pi) < 0.1, f"xN={sol.X[-1]}"


def test_quadrotor_hover_equilibrium():
    sys_ = make_quadrotor(0.01, jnp.zeros(6), Q=jnp.eye(6), R=jnp.eye(2),
                          Q_f=jnp.eye(6))
    u_h = hover_controls(sys_.params)
    x = jnp.zeros(6)
    np.testing.assert_allclose(step(sys_, x, u_h), x, atol=1e-5)


def test_quadrotor_goto():
    dt, N = 0.02, 150
    x_goal = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    sys_ = make_quadrotor(
        dt, x_goal,
        Q=jnp.diag(jnp.array([1.0, 1.0, 0.5, 0.1, 0.1, 0.1])),
        R=0.1 * jnp.eye(2),
        Q_f=jnp.diag(jnp.array([100.0, 100.0, 50.0, 10.0, 10.0, 10.0])),
    )
    U0 = jnp.tile(hover_controls(sys_.params)[None], (N, 1))
    # The unregularized (reference-parity) pass line-search-fails on this
    # stiff problem at iteration 0 — the adaptive-regularization path exists
    # precisely for this; it converges to the goal.
    sol = it.solve(sys_, jnp.zeros(6), U0,
                   it.IlqrConfig(maxiter=300, tol=1e-7, adaptive_reg=True))
    assert int(sol.status) == it.CONVERGED
    np.testing.assert_allclose(np.asarray(sol.X[-1][:2]), [1.0, 1.0], atol=0.05)
