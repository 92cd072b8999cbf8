"""Integrator unit tests against closed-form / ODE oracles.

Formalizes the reference's informal `__main__` self-test
(`/root/reference/python/class_files/systems/pendulum_sys.py:101-313`):
backward-Euler ≈ Euler for small dt, every integrator converges to the true
solution with the expected order, and Jacobians of the implicit step match
the IFT solution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.models.base import System
from ilqr_tpu.models.pendulum import make_pendulum
from ilqr_tpu.ops.integrators import step


def _linear_system(dt, integrator, lam=-2.0):
    # ẋ = λx + u — closed form with u=0: x(t) = x0 e^{λt}
    def f_cont(params, x, u):
        return params["lam"] * x + u

    def l(params, x, u):
        return 0.0

    def lf(params, x):
        return 0.0

    return System(
        params={"lam": jnp.asarray(lam)},
        n_x=1, n_u=1, dt=dt, f_cont=f_cont, stage_cost=l, terminal_cost=lf,
        integrator=integrator,
    )


def _global_error(integrator, dt, lam=-2.0, T=0.5):
    sys_ = _linear_system(dt, integrator, lam)
    x = jnp.array([1.0])
    u = jnp.array([0.0])
    for _ in range(int(round(T / dt))):
        x = step(sys_, x, u)
    return abs(float(x[0]) - float(np.exp(lam * T)))


@pytest.mark.parametrize(
    "integrator,order", [("euler", 1), ("midpoint", 2), ("backward_euler", 1)]
)
def test_convergence_order(integrator, order):
    e1, e2 = _global_error(integrator, 0.02), _global_error(integrator, 0.01)
    rate = np.log2(e1 / e2)
    assert rate > order - 0.5, f"observed order {rate:.2f} < expected {order}"


def test_rk4_accuracy():
    # RK4's halving gain is below the fp32 noise floor at these step sizes, so
    # assert absolute accuracy instead of the observed order.
    assert _global_error("rk4", 0.02) < 1e-6
    assert _global_error("rk4", 0.02) < _global_error("midpoint", 0.02)
    assert _global_error("midpoint", 0.02) < _global_error("euler", 0.02)


def test_backward_euler_matches_implicit_solution():
    # For ẋ = λx the implicit step has the closed form x/(1 − λ dt).
    dt, lam = 0.05, -3.0
    sys_ = _linear_system(dt, "backward_euler", lam)
    x0 = jnp.array([2.0])
    x1 = step(sys_, x0, jnp.array([0.0]))
    np.testing.assert_allclose(float(x1[0]), 2.0 / (1 - lam * dt), rtol=1e-5)


def test_backward_euler_close_to_euler_small_dt():
    # Reference oracle: BE ≈ FE for small dt (`pendulum_sys.py:200-202`).
    dt = 1e-4
    x = jnp.array([0.7, -0.3])
    u = jnp.array([0.5])
    be = make_pendulum(dt, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                       jnp.zeros((2, 2)), integrator="backward_euler")
    fe = be.with_integrator("euler")
    np.testing.assert_allclose(step(be, x, u), step(fe, x, u), atol=1e-6)


def test_backward_euler_jacobians_ift():
    """jacfwd through the custom_jvp step must equal the IFT Jacobians
    (reference `_be_f_x_fcn`/`_be_f_u_fcn`, system_base.py:146-188)."""
    dt = 0.01
    sys_ = make_pendulum(dt, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                         jnp.zeros((2, 2)), integrator="backward_euler")
    x = jnp.array([0.9, 0.4])
    u = jnp.array([0.3])

    f_x = jax.jacfwd(lambda xx: step(sys_, xx, u))(x)
    f_u = jax.jacfwd(lambda uu: step(sys_, x, uu))(u)

    # IFT oracle at the converged solution.
    x1 = step(sys_, x, u)
    J_x = jax.jacfwd(lambda z: sys_.f_cont(sys_.params, z, u))(x1)
    J_u = jax.jacfwd(lambda v: sys_.f_cont(sys_.params, x1, v))(u)
    A = jnp.eye(2) - dt * J_x
    np.testing.assert_allclose(f_x, jnp.linalg.solve(A, jnp.eye(2)), atol=1e-5)
    np.testing.assert_allclose(f_u, jnp.linalg.solve(A, dt * J_u), atol=1e-5)


def test_trapezoidal_matches_implicit_solution():
    # For ẋ = λx the trapezoidal step has the closed form
    # x·(1 + λdt/2)/(1 − λdt/2).
    dt, lam = 0.05, -3.0
    sys_ = _linear_system(dt, "trapezoidal", lam)
    x1 = step(sys_, jnp.array([2.0]), jnp.array([0.0]))
    np.testing.assert_allclose(
        float(x1[0]), 2.0 * (1 + 0.5 * lam * dt) / (1 - 0.5 * lam * dt),
        rtol=1e-5,
    )


def test_trapezoidal_second_order():
    e1, e2 = _global_error("trapezoidal", 0.02), _global_error("trapezoidal", 0.01)
    rate = np.log2(e1 / e2)
    assert rate > 1.5, f"observed order {rate:.2f} < expected 2"
    # Strictly more accurate than both first-order methods at the same dt.
    assert e1 < _global_error("euler", 0.02)
    assert e1 < _global_error("backward_euler", 0.02)


def test_trapezoidal_a_stable_on_stiff_problem():
    # λdt = -40: explicit Euler diverges, trapezoidal stays bounded
    # (|growth factor| = |1+z/2|/|1−z/2| < 1 for Re z < 0).
    dt, lam = 0.4, -100.0
    sys_ = _linear_system(dt, "trapezoidal", lam).replace(newton_iters=30)
    x = jnp.array([1.0])
    for _ in range(50):
        x = step(sys_, x, jnp.array([0.0]))
    assert abs(float(x[0])) < 1.0

    x_fe = jnp.array([1.0])
    sys_fe = _linear_system(dt, "euler", lam)
    for _ in range(50):
        x_fe = step(sys_fe, x_fe, jnp.array([0.0]))
    # f32 overflow ends in inf/NaN — either way, nowhere near bounded.
    assert not (abs(float(x_fe[0])) < 1e10)


def test_trapezoidal_jacobians_ift():
    """jacfwd through the custom_jvp trapezoidal step must equal the IFT
    Jacobians (I − dt/2·J_x(x1))⁻¹·(I + dt/2·J_x(x0)) etc."""
    dt = 0.01
    sys_ = make_pendulum(dt, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                         jnp.zeros((2, 2)), integrator="trapezoidal")
    x = jnp.array([0.9, 0.4])
    u = jnp.array([0.3])

    f_x = jax.jacfwd(lambda xx: step(sys_, xx, u))(x)
    f_u = jax.jacfwd(lambda uu: step(sys_, x, uu))(u)

    x1 = step(sys_, x, u)
    J_x0 = jax.jacfwd(lambda z: sys_.f_cont(sys_.params, z, u))(x)
    J_x1 = jax.jacfwd(lambda z: sys_.f_cont(sys_.params, z, u))(x1)
    J_u0 = jax.jacfwd(lambda v: sys_.f_cont(sys_.params, x, v))(u)
    J_u1 = jax.jacfwd(lambda v: sys_.f_cont(sys_.params, x1, v))(u)
    A = jnp.eye(2) - 0.5 * dt * J_x1
    np.testing.assert_allclose(
        f_x, jnp.linalg.solve(A, jnp.eye(2) + 0.5 * dt * J_x0), atol=1e-5)
    np.testing.assert_allclose(
        f_u, jnp.linalg.solve(A, 0.5 * dt * (J_u0 + J_u1)), atol=1e-5)


def test_trapezoidal_solver_swingup():
    # The new integrator drives the full solver end-to-end.
    import ilqr_tpu as it

    sys_ = make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                         jnp.zeros((2, 2)), d=0.0, integrator="trapezoidal")
    sol = it.solve(sys_, jnp.array([1.0, 0.0]), jnp.zeros((400, 1)),
                   it.IlqrConfig(maxiter=100, tol=1e-5))
    assert int(sol.status) == 1
    # Same problem as the golden pendulum config; trapezoidal should land on
    # the same optimum up to the integrator's discretization of the OCP
    # (measured 23.795 vs the backward-euler golden 23.436).
    assert abs(float(sol.cost) - 23.4358) < 0.5


def test_step_vmappable():
    sys_ = make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                         jnp.zeros((2, 2)), integrator="backward_euler")
    xs = jnp.stack([jnp.array([0.1 * i, 0.0]) for i in range(16)])
    us = jnp.zeros((16, 1))
    out = jax.vmap(lambda x, u: step(sys_, x, u))(xs, us)
    assert out.shape == (16, 2)
    ref = jnp.stack([step(sys_, xs[i], us[i]) for i in range(16)])
    np.testing.assert_allclose(out, ref, atol=1e-6)
