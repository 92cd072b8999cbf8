"""Augmented-Lagrangian constrained iLQR (ilqr_tpu/constrained.py).

Oracles:
* torque-limited pendulum swing-up — AL box constraint must agree with the
  projected-Newton boxQP path (`IlqrConfig.u_min/u_max`) on cost and satisfy
  the limits;
* state (velocity) constraint — feasibility at tolerance, and the constraint
  must be active (otherwise the test would pass vacuously);
* terminal goal equality — exact-reach constraint drives x_N to the goal far
  tighter than the soft terminal cost alone;
* vmap — the constrained solve is a pure function of (x0,) and batches.
"""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it
from ilqr_tpu.constrained import (
    AlConfig,
    ConstraintSet,
    box_control_constraints,
    goal_constraint,
    merge_constraints,
    solve_constrained,
)
from ilqr_tpu.solver import CONVERGED


def pendulum(Q_f=None):
    return it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=jnp.eye(2) * (0.0 if Q_f is None else Q_f),
        d=0.0, integrator="rk4",
    )


def test_box_constraint_matches_boxqp_path():
    sys_ = pendulum(Q_f=100.0)
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((200, 1))
    lim = 2.5

    cons = box_control_constraints(jnp.array([-lim]), jnp.array([lim]))
    sol_al = jax.jit(lambda x: solve_constrained(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=100, tol=1e-7),
        AlConfig(max_outer=12, ctol=5e-4),
    ))(x0)
    sol_qp = jax.jit(lambda x: it.solve(
        sys_, x, U0,
        it.IlqrConfig(maxiter=200, tol=1e-9, u_min=-lim, u_max=lim),
    ))(x0)

    assert int(sol_al.status) == CONVERGED
    # f32 feasibility floor: the inner solve resolves augmented-cost changes
    # only down to ~eps32*cost, so violations bottom out around 1e-4 relative.
    assert float(sol_al.violation) <= 5e-4
    assert float(jnp.max(jnp.abs(sol_al.U))) <= lim + 5e-4
    # The unconstrained optimum must exceed the limit (constraint active).
    sol_un = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=200, tol=1e-9))
    assert float(jnp.max(jnp.abs(sol_un.U))) > lim
    # Same optimum as the boxQP projected-Newton path.
    assert float(sol_al.cost) == pytest.approx(float(sol_qp.cost), rel=1e-3)


def test_velocity_state_constraint_feasible_and_active():
    sys_ = pendulum(Q_f=100.0)
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((200, 1))
    vmax = 2.0

    def g(params, x, u):
        return jnp.array([x[1] - params["vmax"], -params["vmax"] - x[1]])

    cons = ConstraintSet(params=dict(vmax=vmax), stage_ineq=g)
    sol = jax.jit(lambda x: solve_constrained(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=100, tol=1e-7),
        AlConfig(max_outer=12, ctol=1e-4),
    ))(x0)

    assert float(sol.violation) <= 1e-4
    assert float(jnp.max(jnp.abs(sol.X[:, 1]))) <= vmax + 1e-3
    # Active: unconstrained swing-up exceeds the velocity bound.
    sol_un = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=200, tol=1e-9))
    assert float(jnp.max(jnp.abs(sol_un.X[:, 1]))) > vmax
    # Constrained cost cannot beat the unconstrained optimum.
    assert float(sol.cost) >= float(sol_un.cost) - 1e-6


def test_state_bound_constraints_helper():
    """`state_bound_constraints` box on the velocity dim matches the
    hand-written stage inequality of the test above."""
    from ilqr_tpu.constrained import state_bound_constraints

    sys_ = pendulum(Q_f=100.0)
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((200, 1))
    vmax = 2.0
    # Generous finite bounds on the free (angle) dimension.
    cons = state_bound_constraints(
        jnp.array([-100.0, -vmax]), jnp.array([100.0, vmax]))
    sol = jax.jit(lambda x: solve_constrained(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=100, tol=1e-7),
        AlConfig(max_outer=12, ctol=1e-4),
    ))(x0)
    assert float(sol.violation) <= 1e-4
    assert float(jnp.max(jnp.abs(sol.X[:, 1]))) <= vmax + 1e-3
    # Terminal block included by default: final state also within bounds.
    assert float(jnp.abs(sol.X[-1, 1])) <= vmax + 1e-3


def test_terminal_goal_equality():
    sys_ = pendulum(Q_f=0.0)  # no terminal cost — only the hard constraint
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((300, 1))
    goal = jnp.array([jnp.pi, 0.0])

    sol = jax.jit(lambda x: solve_constrained(
        sys_, goal_constraint(goal), x, U0,
        it.IlqrConfig(maxiter=150, tol=1e-8),
        AlConfig(max_outer=15, ctol=1e-5),
    ))(x0)
    assert float(sol.violation) <= 1e-5
    assert float(jnp.max(jnp.abs(sol.X[-1] - goal))) <= 1e-4

    # Without the constraint (and no terminal cost) the solver stays at rest.
    sol_un = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=150, tol=1e-8))
    assert float(jnp.abs(sol_un.X[-1, 0] - jnp.pi)) > 0.5


def test_merge_constraints_and_traces():
    sys_ = pendulum(Q_f=100.0)
    x0 = jnp.array([0.0, 0.0])
    # 4 s horizon: |u| <= 3 < mgl = 9.81 forces a pumping swing-up, which is
    # infeasible on short horizons — the merged problem must be reachable.
    U0 = jnp.zeros((400, 1))
    cons = merge_constraints(
        box_control_constraints(jnp.array([-3.0]), jnp.array([3.0])),
        goal_constraint(jnp.array([jnp.pi, 0.0])),
    )
    sol = jax.jit(lambda x: solve_constrained(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=100, tol=1e-7),
        AlConfig(max_outer=15, ctol=1e-4),
    ))(x0)
    assert float(sol.violation) <= 1e-4
    assert float(jnp.max(jnp.abs(sol.U))) <= 3.0 + 1e-3
    assert float(jnp.max(jnp.abs(sol.X[-1] - jnp.array([jnp.pi, 0.0])))) <= 1e-3
    # Violation trace is monotone-ish: final entry is below the first.
    vt = sol.violation_trace
    valid = jnp.isfinite(vt)
    assert float(vt[0]) > float(sol.violation) or float(vt[0]) <= 1e-4
    assert int(jnp.sum(valid)) == int(sol.outer_iterations)


def test_vmap_constrained_solve():
    sys_ = pendulum(Q_f=100.0)
    U0 = jnp.zeros((100, 1))
    cons = box_control_constraints(jnp.array([-3.0]), jnp.array([3.0]))
    x0s = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([0.3, 0.0]),
                     jnp.array([-0.3, 0.1])])
    sols = jax.jit(jax.vmap(lambda x: solve_constrained(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=50, tol=1e-6),
        AlConfig(max_outer=8, ctol=1e-4),
    )))(x0s)
    assert sols.X.shape == (3, 101, 2)
    assert bool(jnp.all(sols.violation <= 1e-3))
    # Batched result matches the single solve.
    s0 = solve_constrained(sys_, cons, x0s[0], U0,
                           it.IlqrConfig(maxiter=50, tol=1e-6),
                           AlConfig(max_outer=8, ctol=1e-4))
    assert float(jnp.max(jnp.abs(sols.U[0] - s0.U))) < 1e-5


def test_empty_constraint_set_rejected():
    sys_ = pendulum()
    with pytest.raises(ValueError, match="empty"):
        solve_constrained(sys_, ConstraintSet(), jnp.zeros(2),
                          jnp.zeros((10, 1)))


def test_multiplier_shapes_and_signs():
    sys_ = pendulum(Q_f=100.0)
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((150, 1))
    lim = 2.5
    cons = box_control_constraints(jnp.array([-lim]), jnp.array([lim]))
    sol = solve_constrained(
        sys_, cons, x0, U0, it.IlqrConfig(maxiter=80, tol=1e-7),
        AlConfig(max_outer=10, ctol=1e-4))
    assert sol.lam_stage_ineq.shape == (150, 2)
    # Inequality multipliers are nonnegative by construction.
    assert bool(jnp.all(sol.lam_stage_ineq >= 0.0))
    # Somewhere the limit binds → at least one strictly positive multiplier.
    assert float(jnp.max(sol.lam_stage_ineq)) > 0.0


# ---- Multiple-shooting inner solver (solve_constrained_ms) ----


def _ms_setting():
    sys_ = it.make_pendulum(
        0.02, [jnp.pi, 0.0], Q=jnp.diag(jnp.array([5.0, 0.1])),
        R=0.5 * jnp.eye(1), Q_f=jnp.diag(jnp.array([100.0, 10.0])),
        d=0.0, integrator="rk4",
    )
    cons = box_control_constraints(-4.0, 4.0)
    cfg = it.IlqrConfig(maxiter=60, tol=1e-6)
    acfg = AlConfig(max_outer=12, ctol=1e-3)
    return sys_, cons, jnp.zeros(2), jnp.zeros((100, 1)), cfg, acfg


def test_constrained_ms_matches_single_shooting():
    from ilqr_tpu.constrained import solve_constrained_ms

    sys_, cons, x0, U0, cfg, acfg = _ms_setting()
    ref = solve_constrained(sys_, cons, x0, U0, cfg, acfg)
    sol = solve_constrained_ms(sys_, cons, x0, U0, config=cfg, al_config=acfg)
    assert int(sol.status) == CONVERGED
    assert float(sol.violation) <= acfg.ctol
    assert abs(float(sol.cost) - float(ref.cost)) < 1e-2 * float(ref.cost)
    # Torque limit actually active and respected on the node controls.
    assert float(jnp.max(jnp.abs(sol.U))) <= 4.0 + 1e-3
    assert float(jnp.max(jnp.abs(sol.U))) > 3.9


def test_constrained_ms_infeasible_warm_start():
    from ilqr_tpu.constrained import solve_constrained_ms
    from ilqr_tpu.shooting import interpolate_states

    sys_, cons, x0, U0, cfg, acfg = _ms_setting()
    X0 = interpolate_states(x0, jnp.array([jnp.pi, 0.0]), 100)
    sol = solve_constrained_ms(sys_, cons, x0, U0, X_init=X0,
                               config=cfg, al_config=acfg)
    assert int(sol.status) == CONVERGED
    assert float(sol.violation) <= acfg.ctol
    # Dynamics gaps closed: re-rolling out U reproduces the node cost.
    from ilqr_tpu.ops.rollout import rollout

    _, cost_roll = rollout(sys_, x0, sol.U)
    assert abs(float(cost_roll) - float(sol.cost)) < 1e-2 * float(sol.cost)


def test_constrained_ms_parallel_backend_composes():
    from ilqr_tpu.constrained import solve_constrained_ms

    sys_, cons, x0, U0, _, acfg = _ms_setting()
    cfg = it.IlqrConfig(maxiter=60, tol=1e-6, backward="pscan")
    sol = solve_constrained_ms(sys_, cons, x0, U0, config=cfg, al_config=acfg,
                               ms=__import__("ilqr_tpu").MsConfig(
                                   update_engine="xla"))
    assert int(sol.status) == CONVERGED
    assert float(sol.violation) <= acfg.ctol


def test_constrained_ms_validation():
    from ilqr_tpu.constrained import solve_constrained_ms

    sys_, cons, x0, U0, cfg, acfg = _ms_setting()
    with pytest.raises(ValueError, match="X_init"):
        solve_constrained_ms(sys_, cons, x0, U0, X_init=jnp.zeros((5, 2)),
                             config=cfg, al_config=acfg)
    empty = ConstraintSet()
    with pytest.raises(ValueError, match="empty"):
        solve_constrained_ms(sys_, empty, x0, U0, config=cfg, al_config=acfg)
