"""Batch-fused Pallas kernels (ops/pallas_batched): the batched sequential
Riccati recursion must be the exact vmap of `ops.riccati.backward_pass`,
and the `custom_vmap` wrapper must keep `vmap(solve)` semantics unchanged."""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.pallas_batched import (
    backward_pass_batched,
    backward_pass_smart,
)
from ilqr_tpu.ops.riccati import backward_pass


def _dp():
    return it.make_double_pendulum(
        0.02, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([100.0, 100.0, 10.0, 10.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="rk4",
    )


def _batched_expansion(sys_, B, N, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x0s = 0.3 * jax.random.normal(k1, (B, sys_.n_x))
    Us = 0.1 * jax.random.normal(k2, (B, N, sys_.n_u))
    Xs = jax.vmap(lambda x, u: it.rollout(sys_, x, u)[0])(x0s, Us)
    return jax.vmap(lambda x, u: linearize_trajectory(sys_, x, u))(Xs, Us)


def test_batched_kernel_matches_vmapped_scan():
    exp = _batched_expansion(_dp(), B=5, N=17)
    ref = jax.vmap(lambda e: backward_pass(e, 0.013))(exp)
    got = backward_pass_batched(exp, 0.013, interpret=True)
    for a, b in zip(ref[:3], got[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))


def test_batched_kernel_per_instance_reg():
    exp = _batched_expansion(_dp(), B=4, N=9, seed=2)
    regs = jnp.linspace(0.0, 0.2, 4)
    ref = jax.vmap(lambda e, r: backward_pass(e, r))(exp, regs)
    got = backward_pass_batched(exp, regs, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=2e-4, atol=1e-5)


def test_smart_wrapper_single_and_vmapped():
    exp = _batched_expansion(_dp(), B=3, N=11, seed=1)
    one = jax.tree_util.tree_map(lambda a: a[0], exp)
    u1, K1, dV1, ok1 = backward_pass_smart(one, 0.0)
    u_ref, K_ref, _, _ = backward_pass(one, 0.0)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u_ref), atol=0)
    uB, KB, _, _ = jax.vmap(lambda e: backward_pass_smart(e, 0.0))(exp)
    uV, KV, _, _ = jax.vmap(lambda e: backward_pass(e, 0.0))(exp)
    np.testing.assert_allclose(np.asarray(uB), np.asarray(uV),
                               rtol=2e-4, atol=1e-5)


def test_vmapped_solve_matches_unbatched():
    """vmap(solve) — which routes through backward_pass_smart — must agree
    with per-instance solves."""
    sys_ = _dp()
    cfg = it.IlqrConfig(maxiter=15, tol=1e-7)
    x0s = jnp.array([[0.1, 0.0, 0.0, 0.0], [0.0, 0.2, 0.0, 0.0]])
    U0 = jnp.zeros((24, 2))
    batched = jax.vmap(lambda x: it.solve(sys_, x, U0, cfg))(x0s)
    for i in range(2):
        single = it.solve(sys_, x0s[i], U0, cfg)
        np.testing.assert_allclose(float(batched.cost[i]),
                                   float(single.cost), rtol=1e-5)
