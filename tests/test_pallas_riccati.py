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
    backward_pass_pallas_fused,
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


def test_sublane_layout_matches_lane_layout():
    """Both packings implement the same suffix scan."""
    exp = _pendulum_expansion(N=96)
    elems = make_elements(exp, jnp.asarray(0.0))
    s_lane = suffix_scan_pallas(elems, interpret=True, layout="lane")
    s_sub = suffix_scan_pallas(elems, interpret=True, layout="sub")
    np.testing.assert_allclose(s_sub.J, s_lane.J, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s_sub.eta, s_lane.eta, rtol=1e-5, atol=1e-5)


def test_fused_backward_matches_sequential():
    """Fully fused kernel (elements + scan + closure + gains in one kernel)."""
    exp = _pendulum_expansion(N=96)
    for reg in (0.0, 0.1):
        u_s, K_s, dV_s, _ = backward_pass(exp, reg)
        u_f, K_f, dV_f, ok = backward_pass_pallas_fused(exp, reg, interpret=True)
        assert bool(ok)
        np.testing.assert_allclose(u_f, u_s, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(K_f, K_s, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(dV_f, dV_s, rtol=2e-3, atol=2e-3)


def test_fused_backward_matches_sequential_with_defects():
    """GNMS defects (ilqr_tpu.shooting) through the fused kernel: extra
    packed rows shift the element offsets b and the gains' linear Q-terms."""
    exp = _pendulum_expansion(N=96)
    d = 0.3 * jax.random.normal(jax.random.key(7), (96, 2))
    u_s, K_s, dV_s, _ = backward_pass(exp, 0.0, defects=d)
    u_f, K_f, dV_f, ok = backward_pass_pallas_fused(
        exp, 0.0, defects=d, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(u_f, u_s, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(K_f, K_s, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(dV_f, dV_s, rtol=2e-3, atol=2e-3)


def test_fused_backward_under_vmap():
    """vmap prepends a grid axis to pallas_call; the kernel takes its block
    position from an SMEM operand (not program_id) so the closure carry
    re-seeds per batch element."""
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="rk4")
    N, B = 96, 3
    U = 0.1 * jnp.sin(jnp.linspace(0, 6.0, N))[:, None]
    Us = jnp.stack([U * (1 + 0.3 * b) for b in range(B)])
    x0s = jnp.stack([jnp.array([1.0 + 0.1 * b, 0.0]) for b in range(B)])

    def exp_of(x0, U):
        X, _ = it.rollout(sys_, x0, U)
        return linearize_trajectory(sys_, X, U)

    exps = jax.vmap(exp_of)(x0s, Us)
    u_b, K_b, dV_b, _ = jax.vmap(
        lambda e: backward_pass_pallas_fused(e, 0.0, interpret=True))(exps)
    for b in range(B):
        e = jax.tree_util.tree_map(lambda a: a[b], exps)
        u_s, K_s, dV_s, _ = backward_pass(e, 0.0)
        np.testing.assert_allclose(u_b[b], u_s, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(K_b[b], K_s, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(dV_b[b], dV_s, rtol=2e-3, atol=2e-3)


def test_sub_blocking_is_power_of_two():
    """Regression: the sweep schedule silently double-counts elements when
    l_blk is not a power of two (l_blk=384 gave |Δu_ff| ≈ 0.29); the sizing
    must only ever produce power-of-two lane widths."""
    from ilqr_tpu.ops.pallas_riccati import _sub_blocking

    for M in [1, 97, 1025, 2501, 4097, 7000, 8192, 8193, 50001]:
        l_blk, n_blocks = _sub_blocking(M)
        assert l_blk & (l_blk - 1) == 0
        assert l_blk % 128 == 0
        assert n_blocks * 8 * l_blk >= M


def test_fused_backward_default_sizing_n2500():
    """Regression at a horizon that previously produced l_blk=384 (wrong
    gains); runs the production sizing path, no monkeypatching."""
    exp = _pendulum_expansion(N=2500)
    u_f, K_f, _, ok = backward_pass_pallas_fused(exp, 0.0, interpret=True)
    u_s, K_s, _, _ = backward_pass(exp, 0.0)
    assert bool(ok)
    np.testing.assert_allclose(u_f, u_s, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(K_f, K_s, rtol=2e-3, atol=2e-3)


def test_fused_backward_multiblock_closure():
    """Horizon longer than one kernel block exercises the SMEM boundary carry.

    Interpret mode is slow — use the smallest multi-block configuration by
    monkeypatching MAX_SUB_LANES down so blocks hold 8·128 = 1024 steps.
    """
    import ilqr_tpu.ops.pallas_riccati as pr

    exp = _pendulum_expansion(N=2500)  # 3 blocks at 1024 steps/block
    old = pr.MAX_SUB_LANES
    pr.MAX_SUB_LANES = 128
    try:
        u_f, K_f, _, ok = backward_pass_pallas_fused(exp, 0.0, interpret=True)
    finally:
        pr.MAX_SUB_LANES = old
    u_s, K_s, _, _ = backward_pass(exp, 0.0)
    assert bool(ok)
    np.testing.assert_allclose(u_f, u_s, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(K_f, K_s, rtol=2e-3, atol=2e-3)

