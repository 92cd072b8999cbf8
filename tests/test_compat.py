"""Compat facade: reference-shaped API must behave like the reference
(constructor signatures, (dim, time) layout, 13-fn derivative surface)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.compat import MyDoublePendulum, MyPendulum, iLQR


def test_reference_style_workflow():
    """Verbatim reference usage pattern (run_iLQR_open_loop.py:16-108)."""
    dt, T = 0.01, 4.0
    N = len(jnp.arange(0, T + dt, dt)) - 1
    pendulum_sys = MyPendulum(
        dt=dt, x_target=jnp.array([jnp.pi, 0.0]),
        Q=jnp.eye(2), R=jnp.eye(1), Q_f=jnp.zeros((2, 2)),
        g=9.81, l=1.0, d=0.0, integrator="backward_euler", use_jit=True,
    )
    solver = iLQR(system=pendulum_sys, T=T, x_0=jnp.array([1.0, 0.0]),
                  U_init=jnp.zeros((1, N)), tol=1e-5, maxiter=100,
                  verbose=False)

    # Reference warm-up protocol works against the same attribute surface.
    solver.backward_pass(jnp.zeros_like(solver.X), jnp.zeros_like(solver.U))
    solver.forward_pass(solver.x_0, 0.0, solver.X, solver.U,
                        solver.U_ff, solver.K)

    X, U, cost = solver.optimize_trajectory()
    assert X.shape == (2, N + 1)          # (dim, time) layout
    assert U.shape == (1, N)
    np.testing.assert_allclose(float(cost), 23.435774, rtol=1e-3)


def test_u_init_shape_validation():
    sys_ = MyPendulum(dt=0.01, x_target=[jnp.pi, 0.0], Q=jnp.eye(2),
                      R=jnp.eye(1), Q_f=jnp.zeros((2, 2)))
    with pytest.raises(ValueError, match="U_init must have shape"):
        iLQR(sys_, T=1.0, x_0=jnp.zeros(2), U_init=jnp.zeros((100, 1)))


def test_thirteen_function_surface():
    sys_ = MyDoublePendulum(
        dt=0.01, x_target=[jnp.pi, 0, 0, 0], Q=jnp.eye(4),
        R=0.1 * jnp.eye(2), Q_f=jnp.eye(4), theta1=1 / 12, theta2=1 / 12,
    )
    x, u = jnp.array([0.3, -0.2, 0.5, 0.1]), jnp.array([0.2, -0.4])
    assert sys_.f_fcn(x, u).shape == (4,)
    assert sys_.f_x_fcn(x, u).shape == (4, 4)
    assert sys_.f_u_fcn(x, u).shape == (4, 2)
    assert sys_.l_fcn(x, u).shape == ()
    assert sys_.l_x_fcn(x, u).shape == (4,)
    assert sys_.l_u_fcn(x, u).shape == (2,)
    assert sys_.l_xx_fcn(x, u).shape == (4, 4)
    assert sys_.l_ux_fcn(x, u).shape == (2, 4)
    assert sys_.l_uu_fcn(x, u).shape == (2, 2)
    assert sys_.l_f_fcn(x).shape == ()
    assert sys_.l_f_x_fcn(x).shape == (4,)
    assert sys_.l_f_xx_fcn(x).shape == (4, 4)
    # Cross-check one derivative numerically.
    np.testing.assert_allclose(
        sys_.l_f_x_fcn(x),
        np.asarray(jnp.eye(4) @ (x - jnp.array([jnp.pi, 0, 0, 0]))),
        rtol=1e-5,
    )


def test_mpc_pattern_warm_start():
    """The reference MPC pattern: mutate x_0/U between solves
    (run_iLQR_MPC.py:116-140)."""
    dt = 0.01
    N_h = 100
    sys_ = MyPendulum(dt=dt, x_target=[jnp.pi, 0.0],
                      Q=jnp.diag(jnp.array([10.0, 1.0])), R=jnp.eye(1),
                      Q_f=jnp.diag(jnp.array([10.0, 10.0])), d=0.0,
                      integrator="backward_euler")
    solver = iLQR(sys_, T=1.0, x_0=jnp.zeros(2), U_init=jnp.zeros((1, N_h)),
                  maxiter=10, verbose=False)
    x = jnp.zeros(2)
    U_guess = jnp.zeros((1, N_h))
    for _ in range(5):
        solver.x_0 = x
        solver.U = U_guess
        X_bar, U_bar, _ = solver.optimize_trajectory()
        u0 = U_bar[:, 0]
        x = sys_.f_fcn(x, u0)
        U_guess = jnp.concatenate([U_bar[:, 1:], U_bar[:, -1:]], axis=1)
    assert jnp.all(jnp.isfinite(x))
