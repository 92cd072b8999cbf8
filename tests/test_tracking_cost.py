"""Time-varying reference tracking (ilqr_tpu/models/tracking.py).

The reference framework has only fixed-target costs
(`pendulum_sys.py:77-98`); these tests cover the greenfield time-augmented
tracking capability:

* the clock dimension advances exactly +1 per discrete step under every
  integrator;
* tracking a previously-solved swing-up trajectory reproduces it closely —
  and far closer than a fixed-target cost possibly could mid-trajectory;
* a sinusoidal reference is followed (impossible with a fixed target);
* composes with receding-horizon MPC: the clock in the plant state shifts
  the solver's reference window automatically;
* vmaps over a batch of initial states.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.models.base import INTEGRATORS
from ilqr_tpu.models.tracking import augment_x0, make_tracking_system, strip_clock
from ilqr_tpu.ops.integrators import step


def _pendulum(integrator="rk4"):
    return it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=100.0 * jnp.eye(2), d=0.0, integrator=integrator,
    )


@pytest.mark.parametrize("integrator", INTEGRATORS)
def test_clock_advances_one_per_step(integrator):
    base = _pendulum(integrator)
    trk = make_tracking_system(
        base, jnp.zeros((11, 2)), jnp.zeros((10, 1)),
        jnp.eye(2), jnp.eye(1), jnp.zeros((2, 2)))
    x = augment_x0(jnp.array([0.3, -0.1]), k0=0.0)
    for k in range(5):
        x = step(trk, x, jnp.array([0.5]))
        np.testing.assert_allclose(float(x[-1]), k + 1, atol=1e-4)
    # Physical coordinates must match the base system exactly.
    xb = jnp.array([0.3, -0.1])
    for _ in range(5):
        xb = step(base, xb, jnp.array([0.5]))
    np.testing.assert_allclose(strip_clock(x), xb, atol=1e-5)


def test_track_solved_swingup_trajectory():
    base = _pendulum()
    x0 = jnp.array([0.0, 0.0])
    N = 200
    sol = it.solve(base, x0, jnp.zeros((N, 1)), it.IlqrConfig(maxiter=200, tol=1e-8))

    trk = make_tracking_system(
        base, sol.X, sol.U, Q=10.0 * jnp.eye(2), R=0.1 * jnp.eye(1),
        Q_f=100.0 * jnp.eye(2))
    sol_t = it.solve(trk, augment_x0(x0), jnp.zeros((N, 1)),
                     it.IlqrConfig(maxiter=200, tol=1e-8))
    err = jnp.max(jnp.linalg.norm(strip_clock(sol_t.X) - sol.X, axis=-1))
    assert float(err) < 0.05
    # Controls reproduce the reference controls closely too.
    assert float(jnp.max(jnp.abs(sol_t.U - sol.U))) < 0.2


def test_track_sinusoidal_reference():
    base = _pendulum()
    N = 300
    t = jnp.arange(N + 1) * base.dt
    theta_ref = 0.6 * jnp.sin(2.0 * t)
    X_ref = jnp.stack([theta_ref, 1.2 * jnp.cos(2.0 * t)], axis=-1)
    trk = make_tracking_system(
        base, X_ref, jnp.zeros((N, 1)), Q=jnp.diag(jnp.array([50.0, 1.0])),
        R=0.01 * jnp.eye(1), Q_f=jnp.zeros((2, 2)))
    sol = jax.jit(lambda x, u: it.solve(
        trk, x, u, it.IlqrConfig(maxiter=150, tol=1e-8)
    ))(augment_x0(jnp.zeros(2)), jnp.zeros((N, 1)))

    theta = strip_clock(sol.X)[:, 0]
    rms = jnp.sqrt(jnp.mean((theta - theta_ref) ** 2))
    assert float(rms) < 0.05
    # Sanity: the trajectory really is time-varying (reaches both extremes).
    assert float(jnp.max(theta)) > 0.4 and float(jnp.min(theta)) < -0.4


def test_tracking_mpc_shifts_reference_window():
    from ilqr_tpu.mpc import run_mpc

    base = _pendulum()
    N_sim, horizon = 120, 40
    t = jnp.arange(N_sim + horizon + 1) * base.dt
    theta_ref = 0.5 * jnp.sin(3.0 * t)
    X_ref = jnp.stack([theta_ref, 1.5 * jnp.cos(3.0 * t)], axis=-1)
    trk = make_tracking_system(
        base, X_ref, jnp.zeros((N_sim + horizon, 1)),
        Q=jnp.diag(jnp.array([50.0, 1.0])), R=0.01 * jnp.eye(1),
        Q_f=jnp.zeros((2, 2)))

    res = jax.jit(lambda x: run_mpc(
        trk, trk, x, jnp.zeros((horizon, 1)), N_sim,
        it.IlqrConfig(maxiter=8, tol=1e-6),
    ))(augment_x0(jnp.zeros(2)))
    X_cl = res.X
    # Clock advanced one per sim step ...
    np.testing.assert_allclose(np.asarray(X_cl[:, -1]), np.arange(N_sim + 1),
                               atol=1e-3)
    # ... and the closed loop follows the moving reference.
    rms = jnp.sqrt(jnp.mean(
        (strip_clock(X_cl)[20:, 0] - theta_ref[20:N_sim + 1]) ** 2))
    assert float(rms) < 0.07


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_tracking_composes_with_horizon_sharding():
    """The time-augmented tracking system runs under the fully
    horizon-sharded solve: the reference gather is local to each time shard
    (X_ref replicated, clock in the state)."""
    from ilqr_tpu.parallel.horizon_solve import solve_horizon_sharded
    from ilqr_tpu.parallel.mesh import make_mesh

    base = _pendulum()
    N = 64
    t = jnp.arange(N + 1) * base.dt
    X_ref = jnp.stack([0.5 * jnp.sin(2.0 * t), jnp.cos(2.0 * t)], axis=-1)
    trk = make_tracking_system(
        base, X_ref, jnp.zeros((N, 1)), Q=jnp.diag(jnp.array([50.0, 1.0])),
        R=0.01 * jnp.eye(1), Q_f=jnp.zeros((2, 2)))

    cfg = it.IlqrConfig(maxiter=10, tol=1e-8, defect_iters=4)
    mesh = make_mesh({"time": 8})
    _, _, cost, _, status = jax.jit(lambda x, u: solve_horizon_sharded(
        trk, x, u, cfg, mesh))(augment_x0(jnp.zeros(2)), jnp.zeros((N, 1)))
    sol = it.solve(trk, augment_x0(jnp.zeros(2)), jnp.zeros((N, 1)), cfg)
    np.testing.assert_allclose(float(cost), float(sol.cost), rtol=1e-3)


def test_tracking_solve_vmaps():
    base = _pendulum()
    N = 100
    X_ref = jnp.zeros((N + 1, 2))
    trk = make_tracking_system(base, X_ref, jnp.zeros((N, 1)),
                               jnp.eye(2), jnp.eye(1), jnp.eye(2))
    x0s = jnp.stack([augment_x0(jnp.array([0.1 * i, 0.0])) for i in range(4)])
    costs = jax.jit(jax.vmap(lambda x: it.solve(
        trk, x, jnp.zeros((N, 1)), it.IlqrConfig(maxiter=30, tol=1e-6)).cost))(x0s)
    assert costs.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(costs)))
    # Larger initial deviation → larger regulation cost.
    assert float(costs[3]) > float(costs[1])
