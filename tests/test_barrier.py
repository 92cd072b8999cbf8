"""Relaxed log-barrier constrained iLQR (ilqr_tpu/barrier.py).

Oracles:
* torque-limited pendulum swing-up — barrier solution must agree with the
  projected-Newton boxQP path on cost and (approximately) satisfy the limits;
* backend composition — the SAME barrier problem solved with the O(log N)
  associative-scan backward (`backward='pscan'`) must land on the same
  optimum (the whole point of the smooth penalty vs boxQP/AL);
* β(z; δ) smoothness — value/slope continuity at the relaxation threshold
  and agreement with −ln z in the interior;
* loose limits — an inactive constraint must not perturb the optimum;
* vmap — pure function of (x0,), batches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.barrier import (
    BarrierConfig,
    relaxed_log_barrier,
    solve_barrier,
)
from ilqr_tpu.constrained import (
    ConstraintSet,
    box_control_constraints,
    goal_constraint,
)
from ilqr_tpu.solver import CONVERGED


def pendulum(Q_f=100.0):
    return it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=Q_f * jnp.eye(2), d=0.0, integrator="rk4",
    )


def test_relaxed_barrier_smooth_and_matches_log():
    delta = 0.1
    # Interior: exactly -ln z.
    z = jnp.array([0.2, 1.0, 5.0])
    np.testing.assert_allclose(
        relaxed_log_barrier(z, delta), -jnp.log(z), rtol=1e-6)
    # C¹ continuity at z = δ: a ±ε straddle must match the first-order
    # prediction (no jump beyond the smooth slope/curvature change).
    f = lambda zz: relaxed_log_barrier(zz, delta)
    df = jax.grad(f)
    eps = 1e-4
    d1 = -1.0 / delta      # β' on both sides at z = δ
    jump_f = float(f(delta + eps) - f(delta - eps)) - 2 * eps * d1
    assert abs(jump_f) < 1e-5
    d2 = 1.0 / delta**2    # β'' on both sides at z = δ
    jump_df = float(df(delta + eps) - df(delta - eps)) - 2 * eps * d2
    assert abs(jump_df) < 1e-4
    # Defined and increasingly penalizing through infeasibility.
    zz = jnp.array([-1.0, -0.5, 0.0, 0.05])
    b = relaxed_log_barrier(zz, delta)
    assert bool(jnp.all(jnp.isfinite(b)))
    assert bool(jnp.all(jnp.diff(b) < 0))   # decreasing in z = more slack


def test_barrier_matches_boxqp_on_torque_limit():
    sys_ = pendulum()
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((200, 1))
    lim = 2.5

    cons = box_control_constraints(jnp.array([-lim]), jnp.array([lim]))
    sol_b = jax.jit(lambda x: solve_barrier(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=100, tol=1e-8),
        BarrierConfig(n_outer=7, mu0=1.0, mu_factor=0.2, delta=0.1),
    ))(x0)
    sol_qp = jax.jit(lambda x: it.solve(
        sys_, x, U0,
        it.IlqrConfig(maxiter=200, tol=1e-9, u_min=-lim, u_max=lim),
    ))(x0)

    assert int(sol_b.status) == CONVERGED
    # Interior-point iterates approach the bound from inside; the relaxed
    # barrier admits O(μ·δ)-level violations at the end of the schedule.
    assert float(sol_b.violation) <= 1e-2
    assert float(jnp.max(jnp.abs(sol_b.U))) <= lim + 1e-2
    # The unconstrained optimum must exceed the limit (constraint active).
    sol_un = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=200, tol=1e-9))
    assert float(jnp.max(jnp.abs(sol_un.U))) > lim
    assert float(sol_b.cost) == pytest.approx(float(sol_qp.cost), rel=5e-3)
    # The μ-schedule traces are monotone-ish sanity: final cost is best.
    assert bool(jnp.all(jnp.isfinite(sol_b.cost_trace)))


def test_barrier_composes_with_associative_backward():
    """Identical barrier problem through backward='pscan' — the smooth penalty
    keeps the O(log N) backward valid (boxQP/AL cannot do this)."""
    sys_ = pendulum()
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((200, 1))
    lim = 2.5
    cons = box_control_constraints(jnp.array([-lim]), jnp.array([lim]))
    bc = BarrierConfig(n_outer=7, mu0=1.0, mu_factor=0.2, delta=0.1)

    sol_seq = solve_barrier(
        sys_, cons, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-8,
                                          backward="scan"), bc)
    sol_par = solve_barrier(
        sys_, cons, x0, U0, it.IlqrConfig(maxiter=100, tol=1e-8,
                                          backward="pscan"), bc)
    assert int(sol_par.status) == CONVERGED
    assert float(sol_par.cost) == pytest.approx(float(sol_seq.cost), rel=1e-4)
    assert float(jnp.max(jnp.abs(sol_par.U))) <= lim + 1e-2


def test_inactive_constraint_recovers_unconstrained_optimum():
    sys_ = pendulum()
    x0 = jnp.array([0.0, 0.0])
    U0 = jnp.zeros((150, 1))
    cons = box_control_constraints(jnp.array([-50.0]), jnp.array([50.0]))
    sol_b = solve_barrier(sys_, cons, x0, U0,
                          it.IlqrConfig(maxiter=100, tol=1e-8),
                          BarrierConfig(n_outer=6))
    sol_un = it.solve(sys_, x0, U0, it.IlqrConfig(maxiter=200, tol=1e-9))
    assert int(sol_b.status) == CONVERGED
    assert float(sol_b.cost) == pytest.approx(float(sol_un.cost), rel=1e-3)


def test_equality_constraints_rejected():
    sys_ = pendulum()
    with pytest.raises(ValueError, match="inequality"):
        solve_barrier(sys_, goal_constraint(jnp.array([jnp.pi, 0.0])),
                      jnp.zeros(2), jnp.zeros((50, 1)))
    with pytest.raises(ValueError, match="empty"):
        solve_barrier(sys_, ConstraintSet(), jnp.zeros(2), jnp.zeros((50, 1)))


def test_vmap_barrier_solve():
    sys_ = pendulum()
    U0 = jnp.zeros((100, 1))
    lim = 3.0
    cons = box_control_constraints(jnp.array([-lim]), jnp.array([lim]))
    x0s = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([0.3, -0.2]),
                     jnp.array([-0.2, 0.1])])
    f = jax.jit(jax.vmap(lambda x: solve_barrier(
        sys_, cons, x, U0, it.IlqrConfig(maxiter=60, tol=1e-7),
        BarrierConfig(n_outer=5))))
    sols = f(x0s)
    assert sols.U.shape == (3, 100, 1)
    assert bool(jnp.all(jnp.isfinite(sols.cost)))
    assert float(jnp.max(jnp.abs(sols.U))) <= lim + 2e-2
