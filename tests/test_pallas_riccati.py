"""Pallas fused suffix-scan kernel vs the XLA associative scan and the
sequential recursion (interpret mode on CPU; compiled path exercised by
bench.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_tpu as it
from ilqr_tpu.ops.linearize import linearize_trajectory
from ilqr_tpu.ops.pallas_riccati import (
    backward_pass_pallas,
    pack_elements,
    suffix_scan_pallas,
    unpack_elements,
)
from ilqr_tpu.ops.parallel_riccati import make_elements, suffix_scan
from ilqr_tpu.ops.riccati import backward_pass


def _pendulum_expansion(N=100):
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    U = 0.1 * jnp.sin(jnp.linspace(0, 6.0, N))[:, None]
    X, _ = it.rollout(sys_, jnp.array([1.0, 0.0]), U)
    return linearize_trajectory(sys_, X, U)


def test_pack_unpack_roundtrip():
    exp = _pendulum_expansion(N=37)
    elems = make_elements(exp, jnp.asarray(0.0))
    packed = pack_elements(elems, 128)
    back = unpack_elements(packed, elems.A.shape[0], 2)
    for a, b in zip(elems, back):
        np.testing.assert_allclose(a, b, atol=0)


def test_identity_padding_is_neutral():
    """Suffix scan must be invariant to the amount of right-padding."""
    exp = _pendulum_expansion(N=50)
    elems = make_elements(exp, jnp.asarray(0.0))
    s_ref = suffix_scan(elems)
    got = suffix_scan_pallas(elems, interpret=True)  # pads 51 -> 128
    np.testing.assert_allclose(got.J, s_ref.J, atol=2e-4)
    np.testing.assert_allclose(got.eta, s_ref.eta, atol=2e-4)


def test_pallas_gains_match_sequential_pendulum():
    exp = _pendulum_expansion(N=96)  # interpret mode is slow; keep horizons small
    u_s, K_s, _, _ = backward_pass(exp)
    u_p, K_p, _, ok = backward_pass_pallas(exp, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(u_p, u_s, atol=1e-4)
    np.testing.assert_allclose(K_p, K_s, atol=1e-4)


def test_pallas_gains_match_sequential_double_pendulum():
    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0, 0, 0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([10.0, 10.0, 1.0, 1.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )
    N = 64  # interpret mode is slow; keep horizons small
    U = 0.3 * jnp.cos(jnp.linspace(0, 3.0, N))[:, None] * jnp.ones((1, 2))
    X, _ = it.rollout(sys_, jnp.zeros(4), U)
    exp = linearize_trajectory(sys_, X, U)
    u_s, K_s, _, _ = backward_pass(exp)
    u_p, K_p, _, ok = backward_pass_pallas(exp, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(u_p, u_s, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-3, atol=1e-3)
