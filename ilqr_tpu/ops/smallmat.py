"""Closed-form batched small-matrix solves/inverses for the TPU hot path.

`jnp.linalg.solve` on (…, n, n) with n ≤ 4 lowers to pivoted LU — a scalar,
control-flow-heavy path that is brutally slow per element on TPU and blocks
vectorization across the time/batch axes.  Control problems live at
n_x ≤ ~8, n_u ≤ ~4, and the Riccati algebra is dominated by exactly these
tiny solves (`iLQR_class.py:109-110` in the reference; the combine in
`ilqr_tpu.ops.parallel_riccati`), so closed forms are the difference between
VPU-speed-of-light and a per-element interpreter.

Strategy by static dimension:
    n = 1, 2, 3 : adjugate (cofactor) inverse — pure elementwise arithmetic
    n = 4       : 2×2 block inversion via Schur complement (each block solve
                  is a 2×2 adjugate) — still pure elementwise arithmetic
    n = 5 … 8   : 4 + (n−4) block Schur complement over the closed forms
                  above (covers quadrotor n_x=6 and time-augmented states
                  in the implicit integrators)
    n ≥ 9       : fall back to jnp.linalg.solve

All functions are batched over arbitrary leading axes and differentiable.
No pivoting: for SPD/regularized matrices (Q_uu, R, I + C·J) this matches the
conditioning of an unpivoted factorization, which is what the algebra gives
anyway.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv2(A):
    """(…, 2, 2) adjugate inverse."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def inv3(A):
    """(…, 3, 3) adjugate inverse."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def inv4(A):
    """(…, 4, 4) inverse by 2×2 block Schur complement.

    [[P, Q], [R, S]]⁻¹ with P̃ = P⁻¹, Σ = S − R P̃ Q (Schur complement):
      top-left  = P̃ + P̃ Q Σ⁻¹ R P̃     top-right = −P̃ Q Σ⁻¹
      bot-left  = −Σ⁻¹ R P̃            bot-right = Σ⁻¹
    """
    P = A[..., :2, :2]
    Q = A[..., :2, 2:]
    R = A[..., 2:, :2]
    S = A[..., 2:, 2:]
    Pi = inv2(P)
    RPi = R @ Pi
    Sig = S - RPi @ Q
    Sigi = inv2(Sig)
    PiQ = Pi @ Q
    tl = Pi + PiQ @ Sigi @ RPi
    tr = -PiQ @ Sigi
    bl = -Sigi @ RPi
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, Sigi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _inv_block(A, m):
    """Block Schur-complement inverse splitting at row/col m (same identity
    as `inv4`, with each sub-inverse dispatched back through `inv_small`)."""
    P = A[..., :m, :m]
    Q = A[..., :m, m:]
    R = A[..., m:, :m]
    S = A[..., m:, m:]
    Pi = inv_small(P)
    RPi = R @ Pi
    Sig = S - RPi @ Q
    Sigi = inv_small(Sig)
    PiQ = Pi @ Q
    tl = Pi + PiQ @ Sigi @ RPi
    tr = -PiQ @ Sigi
    bl = -Sigi @ RPi
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, Sigi], axis=-1)
    X = jnp.concatenate([top, bot], axis=-2)
    # Two Newton–Schulz refinement steps (X ← X(2I − AX)): the unpivoted
    # block elimination can lose ~2 digits when the leading block is poorly
    # conditioned relative to A; quadratic refinement restores f32 accuracy
    # for four tiny matmuls — still far cheaper than the pivoted-LU path.
    I2 = 2.0 * jnp.eye(A.shape[-1], dtype=A.dtype)
    X = X @ (I2 - A @ X)
    X = X @ (I2 - A @ X)
    return X


def inv_small(A):
    """Closed-form inverse for (…, n, n), n ≤ 8; jnp.linalg.inv otherwise."""
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A
    if n == 2:
        return inv2(A)
    if n == 3:
        return inv3(A)
    if n == 4:
        return inv4(A)
    if n <= 8:
        return _inv_block(A, 4)
    return jnp.linalg.inv(A)


def solve_small(A, B):
    """Solve A X = B for (…, n, n) A with static n.

    B: (…, n) or (…, n, m).  Uses the closed-form inverse for n ≤ 8 — one
    shared inverse amortized across all right-hand sides, all elementwise
    VPU arithmetic (plus tiny block matmuls for n ≥ 5).
    """
    n = A.shape[-1]
    if n > 8:
        return jnp.linalg.solve(A, B)
    Ai = inv_small(A)
    if B.ndim == A.ndim - 1:
        return (Ai @ B[..., None])[..., 0]
    return Ai @ B
