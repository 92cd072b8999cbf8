"""Round-3 distributed surfaces on the 8-way virtual CPU mesh: 2-D
(batch × time) sharded batched MPC and the horizon-sharded parallel Kalman
filter/smoother.  Split from test_sharding.py to balance xdist workers (the
mesh-executable compiles dominate suite wall time)."""
import jax
import jax.numpy as jnp
import pytest

import ilqr_tpu as it

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

def test_run_mpc_batched_2d_matches_1d():
    """Batched MPC over a 2-D (batch × time) mesh reproduces the plain
    vmapped loop: the distributed inner iterations (restoration sweeps +
    sharded Riccati + defect line search) reach the same closed loop."""
    from ilqr_tpu.mpc import run_mpc_batched
    from ilqr_tpu.parallel.horizon_solve import run_mpc_batched_2d
    from ilqr_tpu.parallel.mesh import make_mesh

    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0],
                            Q=jnp.diag(jnp.array([10.0, 1.0])), R=jnp.eye(1),
                            Q_f=jnp.diag(jnp.array([10.0, 10.0])), d=0.0,
                            integrator="rk4")
    mesh = make_mesh({"batch": 4, "time": 2})
    B, H, n_sim = 8, 32, 30
    x0s = jnp.zeros((B, 2)).at[:, 0].set(jnp.linspace(0.5, 1.2, B))
    cfg = it.IlqrConfig(maxiter=4, tol=1e-5, defect_iters=8)
    X2, U2, c2 = jax.jit(lambda x, u: run_mpc_batched_2d(
        sys_, sys_, x, u, n_sim, cfg, mesh))(x0s, jnp.zeros((H, 1)))
    ref = run_mpc_batched(sys_, sys_, x0s, jnp.zeros((H, 1)), n_sim, cfg)
    assert X2.shape == (B, n_sim + 1, 2)
    assert float(jnp.max(jnp.abs(c2 - ref.cost) / ref.cost)) < 1e-3


def test_kalman_filter_smoother_sharded_match_unsharded():
    from ilqr_tpu.estimation_parallel import (
        _linearize_models,
        kalman_filter_parallel,
        kalman_smoother_parallel,
    )
    from ilqr_tpu.parallel.estimation import (
        kalman_filter_sharded,
        kalman_smoother_sharded,
    )
    from ilqr_tpu.parallel.mesh import make_mesh

    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
                            Q_f=jnp.zeros((2, 2)), d=0.1, integrator="rk4")
    N = 64
    U = 0.5 * jnp.sin(jnp.linspace(0, 6, N))[:, None]
    X_true, _ = it.rollout(sys_, jnp.array([0.3, 0.0]), U)
    obs = lambda x: x[:1]
    Y = X_true[1:, :1] + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (N, 1))
    Qp, Ro = 1e-4 * jnp.eye(2), 1e-4 * jnp.eye(1)
    m0, P0 = jnp.array([0.3, 0.0]), 0.01 * jnp.eye(2)
    F, c, H, d = _linearize_models(sys_, obs, X_true, U)

    mesh = make_mesh({"time": 8})
    Xf0, Pf0 = kalman_filter_parallel(F, c, H, d, Qp, Ro, m0, P0, Y)
    Xf1, Pf1 = jax.jit(lambda *a: kalman_filter_sharded(*a, mesh=mesh))(
        F, c, H, d, Qp, Ro, m0, P0, Y)
    assert float(jnp.max(jnp.abs(Xf1 - Xf0))) < 1e-5
    assert float(jnp.max(jnp.abs(Pf1 - Pf0))) < 1e-6

    Xs0, Ps0 = kalman_smoother_parallel(F[1:], c[1:], Qp, Xf0, Pf0)
    Xs1, Ps1 = jax.jit(lambda *a: kalman_smoother_sharded(*a, mesh=mesh))(
        F[1:], c[1:], Qp, Xf0, Pf0)
    assert float(jnp.max(jnp.abs(Xs1 - Xs0))) < 1e-5
    assert float(jnp.max(jnp.abs(Ps1 - Ps0))) < 1e-6
