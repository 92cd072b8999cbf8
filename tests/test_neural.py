"""Neural residual dynamics (ilqr_tpu.models.neural): grey-box sysid."""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it
from ilqr_tpu.models.neural import (
    fit_dynamics,
    make_neural_residual,
    prediction_loss,
)
from ilqr_tpu.ops.rollout import rollout


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    # Reverse-mode fitting programs are large; see NOTES.md on the XLA:CPU
    # cumulative compile-state segfault.
    yield
    jax.clear_caches()


def _pendulum(d, l=1.0):
    return it.make_pendulum(
        0.05, [jnp.pi, 0.0],
        Q=jnp.diag(jnp.array([5.0, 0.5])), R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([50.0, 5.0])), d=d, l=l, integrator="rk4",
    )


def _excitation_data(plant, key, B=8, N=60):
    """Random sinusoidal-torque rollouts of the true plant covering the
    swing-up's state range (large angles/velocities)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    amps = jax.random.uniform(k1, (B, 1, 1), minval=1.0, maxval=6.0)
    freqs = jax.random.uniform(k2, (B, 1, 1), minval=0.5, maxval=3.0)
    t = jnp.linspace(0.0, N * plant.dt, N)[None, :, None]
    U = amps * jnp.sin(freqs * t)
    x0s = jnp.concatenate([
        jax.random.uniform(k3, (B, 1), minval=-3.0, maxval=3.0),
        jax.random.uniform(k4, (B, 1), minval=-4.0, maxval=4.0),
    ], axis=1)
    X = jax.vmap(lambda x0, u: rollout(plant, x0, u)[0])(x0s, U)
    return X, U


def test_zero_init_residual_is_identity():
    base = _pendulum(d=0.1)
    net = make_neural_residual(base, hidden=(16,), key=jax.random.key(3))
    x, u = jnp.array([0.7, -0.2]), jnp.array([0.5])
    assert jnp.array_equal(
        base.f_cont(base.params, x, u), net.f_cont(net.params, x, u)
    )
    X_b, c_b = rollout(base, jnp.array([0.3, 0.0]), 0.4 * jnp.ones((30, 1)))
    X_n, c_n = rollout(net, jnp.array([0.3, 0.0]), 0.4 * jnp.ones((30, 1)))
    assert jnp.allclose(X_b, X_n) and jnp.allclose(c_b, c_n)


def test_fit_learns_mismatch_and_improves_mpc():
    # True plant: l=1.0, d=0.5.  Nominal model: 60% too long, undamped —
    # badly wrong physics.  Fit an MLP residual on multi-step prediction
    # error, then compare closed-loop MPC on the true plant: the learned
    # model must beat the nominal model and come within a hair of the
    # oracle (planning with the true model).  Values below validated on
    # this exact seed/config: nominal 20.64, learned 18.09, oracle 18.06.
    plant = _pendulum(d=0.5, l=1.0)
    base = _pendulum(d=0.0, l=1.6)
    X, U = _excitation_data(plant, jax.random.key(0), B=32)

    net0 = make_neural_residual(base, hidden=(32, 32), key=jax.random.key(1))
    loss0 = prediction_loss(net0, X, U, horizon=10)
    net, losses = fit_dynamics(net0, X, U, steps=1000, learning_rate=3e-3,
                               horizon=10)
    loss1 = prediction_loss(net, X, U, horizon=10)
    assert loss1 < 0.01 * loss0
    assert losses.shape == (1000,) and losses[-1] < losses[0]

    from ilqr_tpu.mpc import run_mpc

    x0 = jnp.zeros(2)
    mcfg = it.IlqrConfig(maxiter=8, tol=1e-6)
    cost = {}
    for name, model in [("nominal", base), ("learned", net),
                        ("oracle", plant)]:
        res = run_mpc(model, plant, x0, jnp.zeros((40, 1)), 80, mcfg)
        cost[name] = float(res.cost)
    assert cost["learned"] < cost["nominal"] - 1.0
    assert abs(cost["learned"] - cost["oracle"]) < 0.5


def test_learned_system_composes_with_solver_transforms():
    base = _pendulum(d=0.1)
    net = make_neural_residual(base, hidden=(8,), key=jax.random.key(2))
    cfg = it.IlqrConfig(maxiter=15, tol=1e-6)
    U0 = jnp.zeros((25, 1))

    # vmapped solves over a batch of initial states.
    x0s = jnp.zeros((4, 2)).at[:, 0].add(jnp.linspace(0.1, 0.4, 4))
    costs = jax.jit(jax.vmap(lambda x: it.solve(net, x, U0, cfg).cost))(x0s)
    assert costs.shape == (4,) and jnp.all(jnp.isfinite(costs))

    # Implicit differentiation THROUGH the solve w.r.t. the MLP weights:
    # end-to-end "tune the model so the planner behaves" gradients.
    from ilqr_tpu.diff import solve_implicit

    def loss(mlp):
        sys_m = net.replace(params={**net.params, "mlp": mlp})
        sol = solve_implicit(sys_m, x0s[0], U0,
                             it.IlqrConfig(maxiter=60, tol=1e-9))
        return jnp.sum(sol.U ** 2)

    g = jax.grad(loss)(net.params["mlp"])
    leaves = jax.tree.leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
    # Zero-init output layer still receives a nonzero gradient signal
    # through its inputs' weights.
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_fit_validates_trainable():
    base = _pendulum(d=0.1)
    net = make_neural_residual(base)
    with pytest.raises(ValueError):
        fit_dynamics(net, jnp.zeros((2, 5, 2)), jnp.zeros((2, 4, 1)),
                     trainable="weights")
