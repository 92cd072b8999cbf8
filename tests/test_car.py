"""Kinematic bicycle model + obstacle-avoidance constraints (models/car.py).

Oracles: straight-line analytic motion, obstacle clearance under the AL
solver with the straight-line (unconstrained) optimum provably violating.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.models.car import make_car, obstacle_constraints
from ilqr_tpu.ops.integrators import step


def car(Q_f=100.0):
    return make_car(
        0.05, x_target=[8.0, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([0.1, 0.1, 0.01, 0.1])),
        R=jnp.diag(jnp.array([1.0, 5.0])),
        Q_f=Q_f * jnp.diag(jnp.array([1.0, 1.0, 0.1, 1.0])),
    )


def test_straight_line_analytic():
    # Constant acceleration, zero steering from the origin: p_x = ½at²,
    # v = at, p_y = θ = 0.
    sys_ = car()
    x = jnp.zeros(4)
    a = 0.7
    for _ in range(40):
        x = step(sys_, x, jnp.array([a, 0.0]))
    t = 40 * 0.05
    np.testing.assert_allclose(float(x[3]), a * t, rtol=1e-5)
    np.testing.assert_allclose(float(x[0]), 0.5 * a * t**2, rtol=1e-4)
    assert abs(float(x[1])) < 1e-6 and abs(float(x[2])) < 1e-6


def test_turning_circle():
    # Constant speed + steering: the heading rate is v/L·tanδ; after time T
    # the heading is θ = T·v/L·tanδ.
    sys_ = make_car(0.01, [0.0] * 4, Q=jnp.eye(4), R=jnp.eye(2),
                    Q_f=jnp.zeros((4, 4)), L=2.0)
    x = jnp.array([0.0, 0.0, 0.0, 3.0])
    delta = 0.3
    for _ in range(100):
        x = step(sys_, x, jnp.array([0.0, delta]))
    expected_heading = 1.0 * 3.0 / 2.0 * np.tan(delta)
    np.testing.assert_allclose(float(x[2]), expected_heading, rtol=1e-4)
    # Speed unchanged (no acceleration).
    np.testing.assert_allclose(float(x[3]), 3.0, rtol=1e-6)


def test_unconstrained_drive_reaches_goal():
    sys_ = car()
    x0 = jnp.zeros(4)
    U0 = jnp.zeros((120, 2))
    sol = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-7))
    assert float(jnp.abs(sol.X[-1, 0] - 8.0)) < 0.1
    assert float(jnp.abs(sol.X[-1, 1])) < 0.05


def test_obstacle_avoidance():
    sys_ = car()
    x0 = jnp.zeros(4)
    U0 = jnp.zeros((120, 2))
    # Disc blocking the straight line from (0,0) to (8,0).
    centers = jnp.array([[4.0, 0.0]])
    radii = jnp.array([1.0])
    cons = obstacle_constraints(centers, radii)

    sol_un = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-7))
    d_un = jnp.min(jnp.linalg.norm(sol_un.X[:, :2] - centers[0], axis=-1))
    assert float(d_un) < 1.0  # straight line passes through the disc

    sol = jax.jit(lambda x: it.solve_constrained(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=100, tol=1e-7),
        it.AlConfig(max_outer=15, ctol=1e-3, mu0=10.0),
    ))(x0)
    d = jnp.min(jnp.linalg.norm(sol.X[:, :2] - centers[0], axis=-1))
    # Residuals are in m² → ctol 1e-3 ≈ 0.5 mm at r=1.
    assert float(sol.violation) <= 1e-3
    assert float(d) >= 1.0 - 1e-3
    # Still reaches the goal.
    assert float(jnp.abs(sol.X[-1, 0] - 8.0)) < 0.2
    # Detour costs more than the straight line.
    assert float(sol.cost) >= float(sol_un.cost)
