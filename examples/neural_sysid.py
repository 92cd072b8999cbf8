"""Grey-box system identification + control: learn an MLP residual on a
wrong nominal model from plant data, then plan through the learned model.

Story: the true pendulum has strong damping (d=0.8) the nominal model
omits (d=0).  We excite the plant, fit a neural residual on the nominal
dynamics (ilqr_tpu.models.neural), and compare three swing-up plans
replayed open-loop on the TRUE plant:

  1. planned with the wrong nominal model,
  2. planned with the learned (nominal + MLP residual) model,
  3. planned directly with the true model (oracle floor).

The learned System is a plain `ilqr_tpu.System`, so the same object drops
into solve / MPC / solve_implicit unchanged.

Run: python examples/neural_sysid.py
"""
import os
import time

import jax
import jax.numpy as jnp

import ilqr_tpu as it
from ilqr_tpu.models.neural import (
    fit_dynamics,
    make_neural_residual,
    prediction_loss,
)
from ilqr_tpu.ops.rollout import rollout


def make(d):
    return it.make_pendulum(
        0.05, [jnp.pi, 0.0],
        Q=jnp.diag(jnp.array([5.0, 0.5])), R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([50.0, 5.0])), d=d, integrator="rk4",
    )


def main():
    plant, nominal = make(d=0.8), make(d=0.0)

    # --- Excite the plant: random sinusoidal torques, varied starts. ---
    B, N = 16, 60
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    amps = jax.random.uniform(k1, (B, 1, 1), minval=0.5, maxval=2.0)
    freqs = jax.random.uniform(k2, (B, 1, 1), minval=0.5, maxval=3.0)
    t = jnp.linspace(0.0, N * plant.dt, N)[None, :, None]
    U_data = amps * jnp.sin(freqs * t)
    x0s = jnp.zeros((B, 2)).at[:, 0].set(
        jax.random.uniform(k3, (B,), minval=-0.5, maxval=0.5))
    X_data = jax.vmap(lambda x0, u: rollout(plant, x0, u)[0])(x0s, U_data)

    # --- Fit the residual. ---
    net = make_neural_residual(nominal, hidden=(32, 32), key=jax.random.key(1))
    print(f"prediction MSE before fit: {prediction_loss(net, X_data, U_data):.2e}")
    t0 = time.perf_counter()
    net, losses = fit_dynamics(net, X_data, U_data, steps=800,
                               learning_rate=3e-3)
    print(f"prediction MSE after fit:  {losses[-1]:.2e}  "
          f"({time.perf_counter() - t0:.1f}s, 800 adam steps on-device)")

    # --- Plan with each model, replay on the true plant. ---
    cfg = it.IlqrConfig(maxiter=150, tol=1e-8)
    x0, U0 = jnp.zeros(2), jnp.zeros((60, 1))
    for name, model in [("nominal (wrong)", nominal),
                        ("learned residual", net),
                        ("true model (oracle)", plant)]:
        U_plan = it.solve(model, x0, U0, cfg).U
        X_true, cost_true = rollout(plant, x0, U_plan)
        print(f"plan with {name:20s} → true-plant cost {float(cost_true):8.3f}"
              f"   final state [{float(X_true[-1, 0]):+.3f} "
              f"{float(X_true[-1, 1]):+.3f}]  (target [+3.142 +0.000])")


if __name__ == "__main__":
    main()
    os._exit(0)  # axon-tunnel processes hang at normal exit
