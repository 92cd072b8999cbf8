"""TVLQR tracking (ilqr_tpu/tracking.py).

Oracles:
* perturbation rejection — tracking a converged swing-up from a perturbed
  initial state under plant/model mismatch must stay near the reference,
  while open-loop replay of the same controls diverges;
* gain synthesis backends agree (sequential vs associative Riccati);
* `track_solution` uses the solver's own gains.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.ops.parallel_riccati import backward_pass_associative
from ilqr_tpu.tracking import track, track_solution, tvlqr_gains


def _swingup():
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                            Q_f=100.0 * jnp.eye(2), d=0.1, integrator="rk4")
    x0 = jnp.zeros(2)
    sol = it.solve(sys_, x0, jnp.zeros((400, 1)),
                   it.IlqrConfig(maxiter=200, tol=1e-6))
    assert float(jnp.abs(sol.X[-1, 0] - jnp.pi)) < 0.05  # swing-up reached
    return sys_, x0, sol


def test_tracking_rejects_perturbation_openloop_does_not():
    sys_, x0, sol = _swingup()
    # Plant mismatch (different damping + integrator) and perturbed start.
    plant = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                             Q_f=100.0 * jnp.eye(2), d=0.13,
                             integrator="midpoint")
    x0p = x0 + jnp.array([0.15, -0.1])

    X_cl, _, _ = track_solution(plant, x0p, sol)
    err_cl = float(jnp.max(jnp.abs(X_cl[-1] - sol.X[-1])))

    X_ol, _ = it.rollout(plant, x0p, sol.U)
    err_ol = float(jnp.max(jnp.abs(X_ol[-1] - sol.X[-1])))

    assert err_cl < 0.1
    assert err_ol > 5 * err_cl  # open-loop replay diverges


def test_tvlqr_gain_backends_agree():
    sys_, x0, sol = _swingup()
    Q, R, Q_f = jnp.eye(2), jnp.eye(1), 100.0 * jnp.eye(2)
    K_seq = tvlqr_gains(sys_, sol.X, sol.U, Q, R, Q_f)
    K_par = tvlqr_gains(sys_, sol.X, sol.U, Q, R, Q_f,
                        backward=backward_pass_associative)
    assert K_seq.shape == (400, 1, 2)
    np.testing.assert_allclose(np.asarray(K_par), np.asarray(K_seq),
                               rtol=2e-3, atol=2e-3)


def test_tvlqr_gains_stabilize():
    sys_, x0, sol = _swingup()
    K = tvlqr_gains(sys_, sol.X, sol.U, 10.0 * jnp.eye(2), jnp.eye(1),
                    100.0 * jnp.eye(2))
    X_cl, U_cl, _ = track(sys_, x0 + jnp.array([0.2, 0.0]), sol.X, sol.U, K)
    assert float(jnp.max(jnp.abs(X_cl[-1] - sol.X[-1]))) < 0.1
    # With limits, applied controls respect them.
    X_lim, U_lim, _ = track(sys_, x0 + jnp.array([0.2, 0.0]), sol.X, sol.U,
                            K, u_limits=(jnp.array([-8.0]), jnp.array([8.0])))
    assert float(jnp.max(jnp.abs(U_lim))) <= 8.0 + 1e-6


def test_tracking_vmaps():
    sys_, x0, sol = _swingup()
    x0s = x0 + jnp.array([[0.1, 0.0], [-0.1, 0.05], [0.0, -0.1]])
    Xs, Us, cs = jax.vmap(lambda x: track_solution(sys_, x, sol))(x0s)
    assert Xs.shape == (3, 401, 2)
    assert bool(jnp.all(jnp.abs(Xs[:, -1, 0] - jnp.pi) < 0.1))
