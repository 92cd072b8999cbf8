"""Finite-difference validation of the trajectory derivative surface
(SURVEY.md §4: "unit tests ... for each derivative function against finite
differences")."""
import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.double_pendulum import make_double_pendulum
from ilqr_tpu.ops.integrators import step
from ilqr_tpu.ops.linearize import linearize_trajectory


def _fd_jac(f, x, eps=1e-4):
    n = x.shape[0]
    cols = []
    for i in range(n):
        e = jnp.zeros_like(x).at[i].set(eps)
        cols.append((f(x + e) - f(x - e)) / (2 * eps))
    return jnp.stack(cols, axis=-1)


def test_expansion_matches_finite_differences():
    sys_ = make_double_pendulum(
        0.01, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="rk4",
    )
    key = jax.random.PRNGKey(0)
    N = 5
    X = 0.3 * jax.random.normal(key, (N + 1, 4))
    U = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (N, 2))

    exp = linearize_trajectory(sys_, X, U)

    k = 2
    x, u = X[k], U[k]
    f_x_fd = _fd_jac(lambda xx: step(sys_, xx, u), x)
    f_u_fd = _fd_jac(lambda uu: step(sys_, x, uu), u)
    l = lambda xx, uu: sys_.stage_cost(sys_.params, xx, uu)
    l_x_fd = _fd_jac(lambda xx: l(xx, u)[None], x)[0]
    l_u_fd = _fd_jac(lambda uu: l(x, uu)[None], u)[0]
    l_xx_fd = _fd_jac(lambda xx: jax.grad(l, argnums=0)(xx, u), x)
    l_uu_fd = _fd_jac(lambda uu: jax.grad(l, argnums=1)(x, uu), u)
    l_ux_fd = _fd_jac(lambda xx: jax.grad(l, argnums=1)(xx, u), x)

    np.testing.assert_allclose(exp.f_x[k], f_x_fd, atol=2e-3)
    np.testing.assert_allclose(exp.f_u[k], f_u_fd, atol=2e-3)
    np.testing.assert_allclose(exp.l_x[k], l_x_fd, atol=2e-3)
    np.testing.assert_allclose(exp.l_u[k], l_u_fd, atol=2e-3)
    np.testing.assert_allclose(exp.l_xx[k], l_xx_fd, atol=2e-3)
    np.testing.assert_allclose(exp.l_uu[k], l_uu_fd, atol=2e-3)
    np.testing.assert_allclose(exp.l_ux[k], l_ux_fd, atol=2e-3)

    # Terminal cost is quadratic — compare against the exact analytic
    # derivatives (central differences on a 1000-scale quadratic are pure
    # fp32 roundoff).
    v_x_exact = sys_.params["Q_f"] @ (X[-1] - sys_.params["x_target"])
    np.testing.assert_allclose(exp.v_x, v_x_exact, rtol=1e-5)
    np.testing.assert_allclose(exp.v_xx, sys_.params["Q_f"], atol=1e-4)


def test_expansion_shapes():
    sys_ = make_double_pendulum(
        0.01, [jnp.pi, 0, 0, 0], Q=jnp.eye(4), R=jnp.eye(1),
        Q_f=jnp.eye(4), underactuated=True,
    )
    N = 7
    X = jnp.zeros((N + 1, 4))
    U = jnp.zeros((N, 1))
    exp = linearize_trajectory(sys_, X, U)
    assert exp.f_x.shape == (N, 4, 4)
    assert exp.f_u.shape == (N, 4, 1)
    assert exp.l_ux.shape == (N, 1, 4)
    assert exp.v_xx.shape == (4, 4)
