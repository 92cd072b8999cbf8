"""Model-level parity: our dynamics, Jacobians, and costs must match the
reference implementation's values on random samples to fp32 tolerance.

This is the load-bearing parity gate: given identical models, the solvers
optimize the *same problem*; converged-trajectory differences can then only be
local-optimum selection (asserted separately in test_solver.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.models.double_pendulum import make_double_pendulum
from ilqr_tpu.ops.integrators import step

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dynamics_samples.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _sys(integrator):
    # Parameters must match tests/golden/make_golden.py::dynamics_samples.
    return make_double_pendulum(
        0.01, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        g=9.81, m1=1.0, m2=1.3, l1=1.0, l2=0.8, d1=0.1, d2=0.2,
        theta1=1.0 / 12.0, theta2=1.3 * 0.8**2 / 12.0,
        integrator=integrator,
    )


@pytest.mark.parametrize("integ", ["euler", "midpoint", "rk4", "backward_euler"])
def test_dynamics_parity(golden, integ):
    sys_ = _sys(integ)
    xs, us = jnp.asarray(golden["xs"]), jnp.asarray(golden["us"])
    f = jax.vmap(lambda x, u: step(sys_, x, u))(xs, us)
    np.testing.assert_allclose(f, golden[f"f_{integ}"], atol=2e-4)


@pytest.mark.parametrize("integ", ["euler", "midpoint", "rk4", "backward_euler"])
def test_jacobian_parity(golden, integ):
    sys_ = _sys(integ)
    xs, us = jnp.asarray(golden["xs"]), jnp.asarray(golden["us"])
    f_x = jax.vmap(jax.jacfwd(lambda x, u: step(sys_, x, u), argnums=0))(xs, us)
    f_u = jax.vmap(jax.jacfwd(lambda x, u: step(sys_, x, u), argnums=1))(xs, us)
    np.testing.assert_allclose(f_x, golden[f"fx_{integ}"], atol=2e-3)
    np.testing.assert_allclose(f_u, golden[f"fu_{integ}"], atol=2e-3)


def test_cost_parity(golden):
    sys_ = _sys("euler")
    xs, us = jnp.asarray(golden["xs"]), jnp.asarray(golden["us"])
    l = jax.vmap(lambda x, u: sys_.stage_cost(sys_.params, x, u))(xs, us)
    lf = jax.vmap(lambda x: sys_.terminal_cost(sys_.params, x))(xs)
    np.testing.assert_allclose(l, golden["l"], rtol=1e-5)
    np.testing.assert_allclose(lf, golden["l_f"], rtol=1e-5)
