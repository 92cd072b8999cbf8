"""Gauss-Newton multiple shooting (ilqr_tpu.shooting)."""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.riccati import backward_pass
from ilqr_tpu.ops.rollout import rollout
from ilqr_tpu.shooting import interpolate_states, solve_ms, MsConfig


def _pendulum():
    # The reference pendulum open-loop config (run_iLQR_open_loop.py:16-43);
    # golden converged cost 23.435774 (tests/golden, produced from the
    # reference implementation).
    return it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=jnp.zeros((2, 2)), d=0.0, integrator="backward_euler",
    )


GOLDEN_COST = 23.435774


def test_defect_backward_pass_reduces_to_plain_at_zero_defect():
    sys_ = _pendulum()
    U = 0.3 * jnp.sin(jnp.linspace(0, 4, 50))[:, None]
    X, _ = rollout(sys_, jnp.array([1.0, 0.0]), U)
    exp = linearize_trajectory(sys_, X, U)
    u_ff0, K0, dV0, ok0 = backward_pass(exp, 0.0)
    u_ff1, K1, dV1, ok1 = backward_pass(exp, 0.0, defects=jnp.zeros((50, 2)))
    assert jnp.allclose(u_ff0, u_ff1) and jnp.allclose(K0, K1)
    assert jnp.allclose(dV0, dV1) and bool(ok0) and bool(ok1)


def test_defect_backward_pscan_matches_sequential():
    # The associative-scan backward pass with defects (gaps enter the
    # elements' affine offsets b; gains shift by V_xx·d) must match the
    # sequential defect-aware recursion.
    from ilqr_tpu.ops.parallel_riccati import backward_pass_associative

    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                            Q_f=10 * jnp.eye(2), d=0.1, integrator="rk4")
    N = 61
    U = 0.5 * jax.random.normal(jax.random.key(0), (N, 1))
    X = jax.random.normal(jax.random.key(1), (N + 1, 2))
    d = 0.3 * jax.random.normal(jax.random.key(2), (N, 2))
    exp = linearize_trajectory(sys_, X, U)
    uff_s, K_s, dV_s, _ = backward_pass(exp, 0.0, defects=d)
    uff_p, K_p, dV_p, ok = backward_pass_associative(exp, 0.0, defects=d)
    assert bool(ok)
    assert jnp.max(jnp.abs(uff_s - uff_p)) < 1e-4
    assert jnp.max(jnp.abs(K_s - K_p)) < 1e-4
    assert jnp.max(jnp.abs(dV_s - dV_p)) < 1e-3


def test_update_pass_engines_agree():
    # The affine update pass is exact under every engine: vmapped sequential
    # scan vs O(log N) associative prefix scan must agree to fp accuracy.
    from ilqr_tpu.shooting import _update_pass_multi

    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                            Q_f=10 * jnp.eye(2), d=0.1, integrator="rk4")
    N = 61
    U = 0.5 * jax.random.normal(jax.random.key(0), (N, 1))
    X = jax.random.normal(jax.random.key(1), (N + 1, 2))
    d = 0.3 * jax.random.normal(jax.random.key(2), (N, 2))
    exp = linearize_trajectory(sys_, X, U)
    u_ff, K, _, _ = backward_pass(exp, 0.0, defects=d)
    alphas = jnp.asarray([1.0, 0.5, 0.25])
    dX1, dU1 = _update_pass_multi(alphas, exp, d, u_ff, K, "seq")
    dX2, dU2 = _update_pass_multi(alphas, exp, d, u_ff, K, "xla")
    assert jnp.max(jnp.abs(dX1 - dX2)) < 1e-4
    assert jnp.max(jnp.abs(dU1 - dU2)) < 1e-4


def test_solve_ms_parallel_backends_match_golden():
    # Fully parallel-in-time MS iteration (pscan backward + xla update pass)
    # must reproduce the golden solve.
    sys_ = _pendulum()
    cfg = it.IlqrConfig(maxiter=100, tol=1e-5, backward="pscan")
    sol = solve_ms(sys_, jnp.array([1.0, 0.0]), jnp.zeros((400, 1)),
                   config=cfg, ms=MsConfig(update_engine="xla"))
    assert int(sol.status) == it.CONVERGED
    assert abs(float(sol.cost) - GOLDEN_COST) < 1e-3
    assert float(sol.defect) < 1e-5


def test_ms_config_validation():
    with pytest.raises(ValueError):
        MsConfig(update_engine="gpu")


def test_feasible_init_matches_single_shooting_golden():
    sys_ = _pendulum()
    cfg = it.IlqrConfig(maxiter=100, tol=1e-5)
    sol = solve_ms(sys_, jnp.array([1.0, 0.0]), jnp.zeros((400, 1)), config=cfg)
    assert int(sol.status) == it.CONVERGED
    assert abs(float(sol.cost) - GOLDEN_COST) < 1e-3
    assert float(sol.defect) < 1e-5
    # The returned nodes are a genuine trajectory: re-rolling out U from x0
    # reproduces X.
    X_roll, cost_roll = rollout(sys_, jnp.array([1.0, 0.0]), sol.U)
    assert jnp.max(jnp.abs(X_roll - sol.X)) < 1e-4
    assert abs(float(cost_roll) - float(sol.cost)) < 1e-3


def test_gap_closing_from_infeasible_node_pair():
    # X from the converged solution, U all zeros: a maximally inconsistent
    # (X, U) pair whose X is already optimal.  MS must close the gaps and
    # recover the optimum in a few iterations.
    sys_ = _pendulum()
    cfg = it.IlqrConfig(maxiter=100, tol=1e-5)
    x0 = jnp.array([1.0, 0.0])
    sol_ss = it.solve(sys_, x0, jnp.zeros((400, 1)), cfg)
    sol = solve_ms(sys_, x0, jnp.zeros((400, 1)), X_init=sol_ss.X, config=cfg)
    assert int(sol.status) == it.CONVERGED
    assert int(sol.iterations) <= 6
    assert abs(float(sol.cost) - GOLDEN_COST) < 1e-3
    assert float(sol.defect) < 1e-5


def test_straight_line_init_converges_feasibly():
    sys_ = _pendulum()
    cfg = it.IlqrConfig(maxiter=100, tol=1e-5)
    x0 = jnp.array([1.0, 0.0])
    X0 = interpolate_states(x0, jnp.array([jnp.pi, 0.0]), 400)
    sol = solve_ms(sys_, x0, jnp.zeros((400, 1)), X_init=X0, config=cfg)
    assert int(sol.status) == it.CONVERGED
    assert float(sol.defect) < 1e-4
    # Feasibility: re-rolling out U reproduces the cost.  (Pointwise state
    # agreement is NOT asserted — f32 per-step gaps of ~1e-7 compound through
    # the open-loop-unstable dynamics over 400 steps.)
    X_roll, cost_roll = rollout(sys_, x0, sol.U)
    assert abs(float(cost_roll) - float(sol.cost)) < 1e-2 * float(sol.cost)
    assert jnp.isfinite(sol.cost)


def test_vmap_and_jit_compose():
    sys_ = _pendulum()
    cfg = it.IlqrConfig(maxiter=60, tol=1e-5)
    U0 = jnp.zeros((100, 1))
    x0s = jnp.zeros((4, 2)).at[:, 0].add(jnp.linspace(0.5, 1.2, 4))
    f = jax.jit(jax.vmap(lambda x: solve_ms(sys_, x, U0, config=cfg).cost))
    costs = f(x0s)
    assert costs.shape == (4,) and bool(jnp.all(jnp.isfinite(costs)))
    # Harder swing-ups cost more (monotone in initial displacement here).
    assert bool(jnp.all(jnp.diff(costs) > 0))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_solve_ms_horizon_sharded_matches_unsharded():
    # Fully horizon-sharded multiple shooting: distributed defect-aware
    # Riccati + ONE multi-candidate distributed affine prefix per iteration.
    # From the same constant-x0 warm start it must match the unsharded
    # solve_ms optimum.
    import numpy as np

    from ilqr_tpu.parallel.horizon_solve import solve_ms_horizon_sharded
    from ilqr_tpu.parallel.mesh import make_mesh

    sys_ = _pendulum()
    x0, U0 = jnp.array([1.0, 0.0]), jnp.zeros((400, 1))
    cfg = it.IlqrConfig(maxiter=60, tol=1e-5)
    X_c = jnp.broadcast_to(x0, (401, 2))
    ref = solve_ms(sys_, x0, U0, X_init=X_c, config=cfg)
    assert int(ref.status) == it.CONVERGED

    mesh = make_mesh({"time": 8})
    X, U, cost, k, status = jax.jit(
        lambda x, u: solve_ms_horizon_sharded(sys_, x, u, cfg, mesh)
    )(x0, U0)
    assert int(status) == it.CONVERGED
    np.testing.assert_allclose(float(cost), float(ref.cost), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(X), np.asarray(ref.X), atol=1e-2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 (virtual) devices")
def test_solve_ms_horizon_sharded_validation():
    from ilqr_tpu.parallel.horizon_solve import solve_ms_horizon_sharded
    from ilqr_tpu.parallel.mesh import make_mesh

    sys_ = _pendulum()
    mesh = make_mesh({"time": 4}, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divisible"):
        solve_ms_horizon_sharded(sys_, jnp.zeros(2), jnp.zeros((401, 1)),
                                 it.IlqrConfig(), mesh)


def test_mpc_ms_swings_up_under_model_mismatch():
    # Multiple-shooting MPC with shifted-primal (X and U) warm starts must
    # swing the pendulum up under solver/plant integrator mismatch, matching
    # the single-shooting MPC closed loop.
    from ilqr_tpu.mpc import run_mpc, run_mpc_ms

    solver_sys = it.make_pendulum(
        0.02, [jnp.pi, 0.0], Q=jnp.diag(jnp.array([5.0, 0.1])),
        R=0.5 * jnp.eye(1), Q_f=jnp.diag(jnp.array([100.0, 10.0])),
        d=0.0, integrator="backward_euler",
    )
    plant_sys = solver_sys.with_integrator("midpoint")
    cfg = it.IlqrConfig(maxiter=6, tol=1e-6)
    x0, U0, n_sim = jnp.zeros(2), jnp.zeros((50, 1)), 150

    res_ms = run_mpc_ms(solver_sys, plant_sys, x0, U0, n_sim, cfg)
    assert abs(float(res_ms.X[-1, 0]) - jnp.pi) < 0.05
    assert abs(float(res_ms.X[-1, 1])) < 0.1

    res_ss = run_mpc(solver_sys, plant_sys, x0, U0, n_sim, cfg)
    assert abs(float(res_ms.cost) - float(res_ss.cost)) < 0.05 * float(res_ss.cost)


def test_validation_errors():
    sys_ = _pendulum()
    with pytest.raises(ValueError):
        solve_ms(sys_, jnp.zeros(2), jnp.zeros((10, 3)))
    with pytest.raises(ValueError):
        solve_ms(sys_, jnp.zeros(3), jnp.zeros((10, 1)))
    with pytest.raises(ValueError):
        solve_ms(sys_, jnp.zeros(2), jnp.zeros((10, 1)),
                 X_init=jnp.zeros((5, 2)))


def test_traces_and_config():
    sys_ = _pendulum()
    cfg = it.IlqrConfig(maxiter=40, tol=1e-5)
    sol = solve_ms(sys_, jnp.array([1.0, 0.0]), jnp.zeros((200, 1)),
                   config=cfg, ms=MsConfig(dtol=1e-4))
    k = int(sol.iterations)
    assert sol.cost_trace.shape == (40,)
    # Defect trace is finite where iterations happened (accepted steps).
    assert bool(jnp.isfinite(sol.cost_trace[: max(k - 1, 1)]).any())
    assert bool(jnp.all(jnp.isnan(sol.cost_trace[k:])))
