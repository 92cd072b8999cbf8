"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4):
batch sharding of the solver and horizon sharding of the Riccati pass."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.riccati import backward_pass
from ilqr_tpu.parallel.batch import solve_batched
from ilqr_tpu.parallel.horizon import backward_pass_sharded
from ilqr_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _pendulum():
    return it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=jnp.zeros((2, 2)), d=0.0, integrator="rk4",
    )


def test_batched_solve_sharded_matches_unsharded():
    sys_ = _pendulum()
    mesh = make_mesh({"batch": 8})
    B, N = 16, 200
    x0s = jnp.stack([jnp.array([0.1 * i, 0.0]) for i in range(B)])
    U0 = jnp.zeros((N, 1))
    cfg = it.IlqrConfig(maxiter=15)
    sols_sharded = solve_batched(sys_, x0s, U0, cfg, mesh=mesh)
    sols_local = solve_batched(sys_, x0s, U0, cfg, mesh=None)
    np.testing.assert_allclose(
        np.asarray(sols_sharded.cost), np.asarray(sols_local.cost), rtol=1e-4
    )


def test_horizon_sharded_backward_matches_sequential():
    sys_ = _pendulum()
    N = 256
    U = 0.2 * jnp.sin(jnp.linspace(0, 5.0, N))[:, None]
    X, _ = it.rollout(sys_, jnp.array([1.0, 0.0]), U)
    exp = linearize_trajectory(sys_, X, U)

    u_ff_s, K_s, dV_s, _ = backward_pass(exp)

    mesh = make_mesh({"time": 8})
    u_ff_h, K_h, dV_h, ok = jax.jit(
        lambda e: backward_pass_sharded(e, mesh, axis="time")
    )(exp)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(u_ff_h), np.asarray(u_ff_s),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(K_h), np.asarray(K_s),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dV_h), np.asarray(dV_s),
                               rtol=1e-2, atol=1e-3)


def test_horizon_sharded_on_double_pendulum():
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0, 0, 0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    N = 512
    U = 0.5 * jnp.cos(jnp.linspace(0, 3.0, N))[:, None] * jnp.ones((1, 2))
    X, _ = it.rollout(sys_, jnp.zeros(4), U)
    exp = linearize_trajectory(sys_, X, U)
    # With the stiff Q_f=1000 terminal, fp32 *grouping order* moves the
    # near-terminal gains by ~1e-2 even between the unsharded associative scan
    # and the sequential recursion (same algebra, different association).  The
    # sharded pass owns only the block decomposition, so compare it against
    # the unsharded associative pass (identical algebra).
    u_ff_a, K_a, _, _ = it.backward_pass_associative(exp)
    mesh = make_mesh({"time": 8})
    u_ff_h, K_h, _, ok = backward_pass_sharded(exp, mesh, axis="time")
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(u_ff_h), np.asarray(u_ff_a),
                               rtol=5e-3, atol=5e-2)


def test_indivisible_horizon_raises():
    sys_ = _pendulum()
    N = 250  # not divisible by 8
    U = jnp.zeros((N, 1))
    X, _ = it.rollout(sys_, jnp.array([1.0, 0.0]), U)
    exp = linearize_trajectory(sys_, X, U)
    mesh = make_mesh({"time": 8})
    with pytest.raises(ValueError, match="divisible"):
        backward_pass_sharded(exp, mesh, axis="time")


def test_solve_multistart_picks_best_basin():
    from ilqr_tpu.parallel.batch import solve_multistart

    # Multimodal: double-pendulum swing-up — different warm starts land in
    # different local optima; multistart must return the lowest cost.
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    x0 = jnp.zeros(4)
    N, S = 300, 4
    key = jax.random.PRNGKey(0)
    U_inits = jnp.concatenate([
        jnp.zeros((1, N, 2)),
        0.5 * jax.random.normal(key, (S - 1, N, 2)),
    ])
    cfg = it.IlqrConfig(maxiter=60, tol=1e-6)
    best, sols = solve_multistart(sys_, x0, U_inits, cfg)
    assert sols.cost.shape == (S,)
    # `best` is the argmin over NON-line-search-failed starts (batch.py:90-96)
    # — comparing against the raw min silently fails when a failed solve
    # ends marginally lower.
    from ilqr_tpu.solver import LINESEARCH_FAILED

    ranked = jnp.where((sols.status == LINESEARCH_FAILED)
                       & ~jnp.all(sols.status == LINESEARCH_FAILED),
                       jnp.inf, sols.cost)
    assert float(best.cost) == float(jnp.min(ranked))
    # The best start must do at least as well as the zero start (up to the
    # f32 cost floor: the zero start may end LINESEARCH_FAILED an ulp lower
    # and be excluded from `best` by design).
    assert float(best.cost) <= float(sols.cost[0]) + 1e-4 * max(
        1.0, abs(float(sols.cost[0])))


def test_solve_multistart_sharded_matches_unsharded():
    from ilqr_tpu.parallel.batch import solve_multistart

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    x0 = jnp.array([1.0, 0.0])
    U_inits = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 100, 1))
    cfg = it.IlqrConfig(maxiter=40, tol=1e-6)
    best_u, _ = solve_multistart(sys_, x0, U_inits, cfg)
    mesh = make_mesh({"batch": 4}, devices=jax.devices()[:4])
    best_s, _ = solve_multistart(sys_, x0, U_inits, cfg, mesh=mesh)
    np.testing.assert_allclose(float(best_s.cost), float(best_u.cost),
                               rtol=1e-6)


def test_solve_constrained_ms_horizon_sharded_matches_unsharded():
    """Distributed AL×GNMS (`solve_constrained_ms_horizon_sharded`) reaches
    the unsharded `solve_constrained_ms` optimum on the torque-limited
    swing-up (multipliers sharded with their stages)."""
    from ilqr_tpu.constrained import (
        AlConfig,
        box_control_constraints,
        solve_constrained_ms,
    )
    from ilqr_tpu.parallel.horizon_solve import (
        solve_constrained_ms_horizon_sharded,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2),
                            0.1 * jnp.eye(1), 100 * jnp.eye(2), d=0.0,
                            integrator="rk4")
    cons = box_control_constraints(-2.0, 2.0)
    N = 256
    x0, U0 = jnp.zeros(2), jnp.zeros((N, 1))
    cfg = it.IlqrConfig(maxiter=40, tol=1e-6)
    alc = AlConfig(max_outer=8, ctol=1e-3)
    sol_u = solve_constrained_ms(sys_, cons, x0, U0, config=cfg,
                                 al_config=alc)
    mesh = make_mesh({"time": 8})
    X, U, cost, viol, j, status = jax.jit(
        lambda x, u: solve_constrained_ms_horizon_sharded(
            sys_, cons, x, u, cfg, mesh, al_config=alc))(x0, U0)
    assert int(status) == 1
    assert float(viol) <= 1.5e-3
    np.testing.assert_allclose(float(cost), float(sol_u.cost), rtol=2e-2)
    assert float(jnp.max(jnp.abs(U))) <= 2.0 + 2e-3


def test_sharded_ms_allgather_payload_independent_of_horizon():
    """The sharded MS solve's collectives move O(D·n_x²) per iteration —
    the all-gather payload shapes must be IDENTICAL at different horizon
    lengths (communication independent of N, SURVEY §5's halo design)."""
    import re

    from ilqr_tpu.parallel.horizon_solve import solve_ms_horizon_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    mesh = make_mesh({"time": 8})
    cfg = it.IlqrConfig(maxiter=3, tol=1e-6)

    def collective_shapes(N):
        txt = jax.jit(
            lambda x, u: solve_ms_horizon_sharded(sys_, x, u, cfg, mesh)[2]
        ).lower(jnp.zeros(2), jnp.zeros((N, 1))).compile().as_text()
        ag = sorted(re.findall(r"= (\S+) all-gather", txt))
        cp = re.findall(r"= (\S+) collective-permute", txt)
        return ag, len(cp)

    ag_small, n_halo_small = collective_shapes(64)
    ag_big, n_halo_big = collective_shapes(512)
    assert ag_small == ag_big, (ag_small, ag_big)
    assert n_halo_small == n_halo_big
    # The MS iteration needs exactly one halo exchange per defect evaluation
    # (nominal + candidates): a handful, not O(N).
    assert 0 < n_halo_big <= 8
