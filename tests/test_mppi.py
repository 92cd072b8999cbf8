"""MPPI sampling controller (ilqr_tpu.mppi)."""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it
from ilqr_tpu.mppi import (
    MppiConfig,
    mppi_update,
    run_mpc_mppi,
    solve_mppi,
)
from ilqr_tpu.ops.rollout import rollout


def _pendulum(dt=0.05):
    return it.make_pendulum(
        dt, [jnp.pi, 0.0],
        Q=jnp.diag(jnp.array([5.0, 0.5])), R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([50.0, 5.0])),
        integrator="rk4",
    )


def test_update_reduces_cost_in_expectation():
    sys_ = _pendulum()
    U0 = jnp.zeros((40, 1))
    x0 = jnp.array([0.5, 0.0])
    cost0 = rollout(sys_, x0, U0)[1]
    cfg = MppiConfig(samples=512, temperature=0.3, sigma=1.0)
    U1, ess = jax.jit(
        lambda k: mppi_update(sys_, x0, U0, k, cfg)
    )(jax.random.key(0))
    cost1 = rollout(sys_, x0, U1)[1]
    assert cost1 < cost0
    assert 0.0 < ess <= 1.0


def test_solve_mppi_converges_toward_ilqr_cost():
    # MPPI won't match the gradient-based optimum exactly, but iterated
    # sampling must get within a modest factor on a smooth problem.
    sys_ = _pendulum()
    x0 = jnp.array([0.3, 0.0])
    U0 = jnp.zeros((40, 1))
    ref = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-8))
    cfg = MppiConfig(samples=512, iters=60, temperature=0.05, sigma=0.6,
                     noise_beta=0.8)
    sol = jax.jit(
        lambda k: solve_mppi(sys_, x0, U0, k, cfg)
    )(jax.random.key(1))
    assert sol.cost < 1.2 * ref.cost + 1e-3
    # monotone-ish improvement: final cost far below the first iterate's
    assert sol.cost_trace[-1] < sol.cost_trace[0]
    assert sol.X.shape == (41, 2) and sol.U.shape == (40, 1)


def test_deterministic_given_key_and_vmappable():
    sys_ = _pendulum()
    U0 = jnp.zeros((20, 1))
    cfg = MppiConfig(samples=64, iters=3)
    k = jax.random.key(7)
    f = jax.jit(lambda x0, k: solve_mppi(sys_, x0, U0, k, cfg).U)
    x0 = jnp.array([0.4, 0.0])
    assert jnp.array_equal(f(x0, k), f(x0, k))
    x0s = jnp.stack([x0, -x0])
    Us = jax.jit(jax.vmap(f, in_axes=(0, None)))(x0s, k)
    assert Us.shape == (2, 20, 1)
    assert jnp.all(jnp.isfinite(Us))


def test_control_limits_respected():
    sys_ = _pendulum()
    cfg = MppiConfig(samples=128, iters=5, sigma=2.0, u_min=-1.5, u_max=1.5)
    sol = solve_mppi(
        sys_, jnp.array([0.5, 0.0]), jnp.zeros((30, 1)),
        jax.random.key(3), cfg,
    )
    assert jnp.all(sol.U >= -1.5 - 1e-6) and jnp.all(sol.U <= 1.5 + 1e-6)


def test_elite_fraction_and_validation():
    sys_ = _pendulum()
    cfg = MppiConfig(samples=256, iters=10, elite_frac=0.1, temperature=0.05)
    sol = solve_mppi(
        sys_, jnp.array([0.3, 0.0]), jnp.zeros((30, 1)),
        jax.random.key(4), cfg,
    )
    assert jnp.isfinite(sol.cost)
    with pytest.raises(ValueError):
        MppiConfig(samples=1)
    with pytest.raises(ValueError):
        MppiConfig(elite_frac=0.0)
    with pytest.raises(ValueError):
        MppiConfig(u_min=-1.0)
    with pytest.raises(ValueError):
        MppiConfig(noise_beta=1.0)
    with pytest.raises(ValueError):
        MppiConfig(sigma_decay=0.0)
    with pytest.raises(ValueError):
        solve_mppi(sys_, jnp.zeros(2), jnp.zeros((5, 3)), jax.random.key(0))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_mppi_batch_shards_over_mesh():
    # A batch of MPPI solves sharded over the mesh must match the local vmap
    # bit-for-bit (no collectives in the program — pure data parallelism).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ilqr_tpu.parallel.mesh import make_mesh

    sys_ = _pendulum()
    cfg = MppiConfig(samples=64, iters=3, noise_beta=0.8)
    B = 16
    x0s = jnp.zeros((B, 2)).at[:, 0].add(jnp.linspace(0.1, 0.8, B))
    keys = jax.vmap(jax.random.key)(jnp.arange(B, dtype=jnp.uint32))
    U0 = jnp.zeros((20, 1))

    f = jax.jit(jax.vmap(lambda x0, k: solve_mppi(sys_, x0, U0, k, cfg).cost))
    local = f(x0s, keys)

    mesh = make_mesh({"batch": 8})
    sh = NamedSharding(mesh, P("batch"))
    sharded = f(jax.device_put(x0s, sh), jax.device_put(keys, sh))
    assert jnp.allclose(jnp.asarray(sharded), local, rtol=1e-6)


def test_mppi_mpc_swings_up_torque_limited():
    # The closed-loop sanity check: sampling MPC must swing the pendulum up
    # under a torque limit and hold it there.
    dt = 0.05
    solver_sys = _pendulum(dt)
    plant_sys = solver_sys.with_integrator("midpoint")  # model mismatch
    cfg = MppiConfig(samples=256, iters=4, temperature=0.2, sigma=1.0,
                     noise_beta=0.8, u_min=-8.0, u_max=8.0)
    res = jax.jit(
        lambda k: run_mpc_mppi(
            solver_sys, plant_sys, jnp.zeros(2), jnp.zeros((30, 1)), 120, k, cfg
        )
    )(jax.random.key(11))
    assert res.X.shape == (121, 2) and res.U.shape == (120, 1)
    assert jnp.all(jnp.abs(res.U) <= 8.0 + 1e-5)
    # Settled near upright with low velocity.
    final = res.X[-1]
    assert abs(float(final[0]) - jnp.pi) < 0.15
    assert abs(float(final[1])) < 0.5
