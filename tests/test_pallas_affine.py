"""Multi-candidate affine prefix scan: XLA path vs brute force, Pallas kernel
(interpret mode on CPU) vs XLA path, and the shared-scan defect line search
vs per-candidate sequential rollouts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.ops import pallas_affine as pa
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.parallel_rollout import linesearch_defect_rollouts
from ilqr_tpu.ops.riccati import backward_pass
from ilqr_tpu.ops.rollout import closed_loop_rollout


def _random_problem(N, n, A, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    P = 0.2 * jax.random.normal(k[0], (N, n, n)) + 0.85 * jnp.eye(n)
    q = jax.random.normal(k[1], (A, N, n))
    delta0 = jax.random.normal(k[2], (A, n))
    return P, q, delta0


def _brute(P, q, delta0):
    A, N, n = q.shape
    out = np.zeros((A, N + 1, n))
    for a in range(A):
        x = np.asarray(delta0[a])
        out[a, 0] = x
        for k in range(N):
            x = np.asarray(P[k]) @ x + np.asarray(q[a, k])
            out[a, k + 1] = x
    return out


def test_xla_multi_scan_matches_recurrence():
    P, q, delta0 = _random_problem(N=60, n=3, A=4)
    got = pa.affine_prefix_scan_multi(P, q, delta0, engine="xla")
    np.testing.assert_allclose(got, _brute(P, q, delta0), rtol=1e-4, atol=1e-4)


def test_pallas_kernel_matches_xla_single_block():
    P, q, delta0 = _random_problem(N=100, n=4, A=3)
    ref = pa.affine_prefix_scan_multi(P, q, delta0, engine="xla")
    got = pa.affine_prefix_scan_multi(P, q, delta0, engine="pallas",
                                      interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_matches_xla_blocked():
    # N > 8·l_blk_min (= 1024 steps/block) exercises the in-kernel SMEM
    # cross-block closure of the sublane-packed prefix kernel.
    P, q, delta0 = _random_problem(N=2500, n=2, A=2, seed=3)
    ref = pa.affine_prefix_scan_multi(P, q, delta0, engine="xla")
    got = pa.affine_prefix_scan_multi(P, q, delta0, engine="pallas",
                                      interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pack_sub_layout_roundtrip():
    """pack_affine_sub is block-contiguous t = s·L + l with identity right-
    padding and a trailing block-index row."""
    N, n, A = 37, 4, 5
    P, q, _ = _random_problem(N=N, n=n, A=A)
    n_blocks, l_blk = 1, 128
    packed = pa.pack_affine_sub(P, q, n_blocks, l_blk)
    F = pa.num_fields(n, A)
    assert packed.shape == (F + 1, 8, n_blocks * l_blk)
    flat = (np.asarray(packed[:F])
            .reshape(F, 8, n_blocks, l_blk)
            .transpose(0, 2, 1, 3)
            .reshape(F, n_blocks * 8 * l_blk))
    P2 = flat[: n * n, :N].T.reshape(N, n, n)
    q2 = np.moveaxis(flat[n * n:, :N].reshape(A, n, N), -1, 1)
    np.testing.assert_allclose(P2, P, atol=0)
    np.testing.assert_allclose(q2, q, atol=0)
    # Right padding is the identity element (P = I, q = 0).
    np.testing.assert_allclose(flat[: n * n, N:].T.reshape(-1, n, n),
                               np.broadcast_to(np.eye(n), (1024 - N, n, n)),
                               atol=0)
    np.testing.assert_allclose(flat[n * n:, N:], 0.0, atol=0)


def test_shared_linesearch_matches_sequential_rollouts():
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    x0 = jnp.array([1.0, 0.0])
    N = 250
    U_old = jnp.zeros((N, 1))
    X_old, _ = it.rollout(sys_, x0, U_old)
    exp = linearize_trajectory(sys_, X_old, U_old)
    u_ff, K, _, _ = backward_pass(exp)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    Xs, Us, cs, ds = linesearch_defect_rollouts(
        sys_, x0, alphas, X_old, U_old, u_ff, K, exp, iters=8, engine="xla"
    )
    assert bool(jnp.all(ds < 1e-3))
    for i, a in enumerate(alphas):
        Xr, Ur, cr = closed_loop_rollout(sys_, x0, a, X_old, U_old, u_ff, K)
        np.testing.assert_allclose(Xs[i], Xr, atol=2e-3)
        np.testing.assert_allclose(float(cs[i]), float(cr), rtol=1e-3)
