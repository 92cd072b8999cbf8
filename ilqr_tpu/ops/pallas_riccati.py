"""Fused Pallas TPU kernel for the parallel Riccati suffix scan.

`jax.lax.associative_scan` over `RiccatiElement`s (ilqr_tpu.ops.parallel_riccati)
compiles to ~log2(N) separate XLA kernels, each operating on (N, n_x, n_x)
arrays whose trailing 4×4 matrices are padded to (8, 128) TPU tiles — ~64×
wasted lanes plus an HBM round-trip per sweep.  This kernel instead:

* packs the elements **field-major**: one (F, N) array, F = 3·n_x² + 2·n_x
  scalar fields, with the time axis along TPU *lanes* — every combine becomes
  pure elementwise VPU arithmetic at full 128-lane occupancy;
* runs the whole ceil(log2 N) recursive-doubling suffix sweep **inside one
  kernel**, with the working set resident in VMEM (N=4096, n_x=4 → 0.9 MB);
* inverts the per-step L = I + C_i·J_j in closed form (adjugate / 2×2-block
  Schur, mirroring ilqr_tpu.ops.smallmat) as unrolled scalar-row algebra.

Recursive doubling for an inclusive suffix scan: with E⁰ = leaves, repeat for
d = 1, 2, 4, …:  E[k] ← E[k] ⊗ E[k+d] (where k+d exists).  After ceil(log2 N)
sweeps E[k] = e_k ⊗ … ⊗ e_{N-1}.  Padding uses the combine identity
(A=I, b=0, C=0, η=0, J=0), so lanes beyond N are harmless.

Work is O(N log N) vs the sequential scan's O(N) — the classic parallel-scan
trade, paid in fully-vectorized VPU flops to eliminate O(N) latency.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import f32_matmuls
from ilqr_tpu.ops.linearize import TrajectoryExpansion
from ilqr_tpu.ops.parallel_riccati import (
    RiccatiElement,
    gains_from_value,
    make_elements,
)

LANES = 128


# ---------------------------------------------------------------------------
# Row-symbolic small-matrix algebra: a matrix is a list-of-lists of (1, N)
# row vectors; everything unrolls to elementwise VPU ops at trace time.
# ---------------------------------------------------------------------------

def _mmul(A, B):
    n, m, p = len(A), len(B), len(B[0])
    return [
        [sum(A[i][k] * B[k][j] for k in range(m)) for j in range(p)]
        for i in range(n)
    ]


def _madd(A, B):
    return [[A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def _mT(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def _msym(A):
    n = len(A)
    return [[0.5 * (A[i][j] + A[j][i]) for j in range(n)] for i in range(n)]


def _mvec(A, x):
    return [sum(A[i][k] * x[k] for k in range(len(x))) for i in range(len(A))]


def _vadd(x, y):
    return [a + b for a, b in zip(x, y)]


def _vsub(x, y):
    return [a - b for a, b in zip(x, y)]


def _inv1(A):
    return [[1.0 / A[0][0]]]


def _inv2(A):
    a, b = A[0]
    c, d = A[1]
    idet = 1.0 / (a * d - b * c)
    return [[d * idet, -b * idet], [-c * idet, a * idet]]


def _inv3(A):
    a = A
    c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c01 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    c10 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c12 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c21 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    idet = 1.0 / (a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02)
    return [
        [c00 * idet, c10 * idet, c20 * idet],
        [c01 * idet, c11 * idet, c21 * idet],
        [c02 * idet, c12 * idet, c22 * idet],
    ]


def _inv4(A):
    """2×2-block Schur inversion (see ilqr_tpu.ops.smallmat.inv4)."""
    P = [r[:2] for r in A[:2]]
    Q = [r[2:] for r in A[:2]]
    R = [r[:2] for r in A[2:]]
    S = [r[2:] for r in A[2:]]
    Pi = _inv2(P)
    RPi = _mmul(R, Pi)
    Sig = [[S[i][j] - _mmul(RPi, Q)[i][j] for j in range(2)] for i in range(2)]
    Sigi = _inv2(Sig)
    PiQ = _mmul(Pi, Q)
    tl = _madd(Pi, _mmul(_mmul(PiQ, Sigi), RPi))
    tr = [[-v for v in row] for row in _mmul(PiQ, Sigi)]
    bl = [[-v for v in row] for row in _mmul(Sigi, RPi)]
    return [tl[0] + tr[0], tl[1] + tr[1], bl[0] + Sigi[0], bl[1] + Sigi[1]]


def _minv(A):
    return {1: _inv1, 2: _inv2, 3: _inv3, 4: _inv4}[len(A)](A)


def _combine_rows(Ei, Ej, n_x):
    """(A, b, C, eta, J) row-symbolic combine — earlier Ei, later Ej."""
    Ai, bi, Ci, etai, Ji = Ei
    Aj, bj, Cj, etaj, Jj = Ej
    CJ = _mmul(Ci, Jj)
    L = [[CJ[i][j] + (1.0 if i == j else 0.0) for j in range(n_x)]
         for i in range(n_x)]
    Li = _minv(L)
    Lti = _mT(Li)
    A_new = _mmul(Aj, _mmul(Li, Ai))
    b_new = _vadd(_mvec(Aj, _mvec(Li, _vadd(bi, _mvec(Ci, etaj)))), bj)
    C_new = _msym(_madd(_mmul(_mmul(Aj, _mmul(Li, Ci)), _mT(Aj)), Cj))
    eta_new = _vadd(_mvec(_mT(Ai), _mvec(Lti, _vsub(etaj, _mvec(Jj, bi)))), etai)
    J_new = _msym(_madd(_mmul(_mT(Ai), _mmul(_mmul(Lti, Jj), Ai)), Ji))
    return A_new, b_new, C_new, eta_new, J_new


# ---------------------------------------------------------------------------
# Packing: RiccatiElement (M, n_x, …) pytree  <->  (F, Npad) field-major array
# ---------------------------------------------------------------------------

def _num_fields(n_x: int) -> int:
    return 3 * n_x * n_x + 2 * n_x


def pack_elements(elems: RiccatiElement, n_pad: int) -> jnp.ndarray:
    """Stack element fields into (F, n_pad), identity-padded on the right."""
    M = elems.A.shape[0]
    n_x = elems.A.shape[-1]
    A_flat = elems.A.reshape(M, n_x * n_x).T       # (n_x², M)
    C_flat = elems.C.reshape(M, n_x * n_x).T
    J_flat = elems.J.reshape(M, n_x * n_x).T
    rows = jnp.concatenate(
        [A_flat, elems.b.T, C_flat, elems.eta.T, J_flat], axis=0
    )  # (F, M)
    F = rows.shape[0]
    out = jnp.zeros((F, n_pad), dtype=rows.dtype)
    out = out.at[:, :M].set(rows)
    # Identity element in the padding lanes: A = I, everything else 0.
    eye_rows = jnp.eye(n_x).reshape(-1)  # indices into the A block
    pad_width = n_pad - M
    if pad_width > 0:
        pad_A = jnp.tile(eye_rows[:, None], (1, pad_width))
        out = out.at[: n_x * n_x, M:].set(pad_A)
    return out


def unpack_elements(packed: jnp.ndarray, M: int, n_x: int) -> RiccatiElement:
    nn = n_x * n_x
    A = packed[:nn, :M].T.reshape(M, n_x, n_x)
    b = packed[nn:nn + n_x, :M].T
    C = packed[nn + n_x:2 * nn + n_x, :M].T.reshape(M, n_x, n_x)
    eta = packed[2 * nn + n_x:2 * nn + 2 * n_x, :M].T
    J = packed[2 * nn + 2 * n_x:, :M].T.reshape(M, n_x, n_x)
    return RiccatiElement(A=A, b=b, C=C, eta=eta, J=J)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _rows_of_ref(ref, n_x, roll_shift=None):
    """Row-symbolic (A, b, C, eta, J) views read row-by-row from a ref.

    Reading (and optionally rolling) individual (1, N) rows instead of the
    whole (F, N) array keeps the VMEM scoped-stack footprint at a few rows —
    full-array value semantics kept ~17 copies of the working set live and
    blew the 16 MB budget at N≈4k.
    """
    from jax.experimental.pallas import tpu as pltpu

    def row(i):
        r = ref[i:i + 1, :]
        if roll_shift is not None:
            r = pltpu.roll(r, shift=roll_shift, axis=1)
        return r

    nn = n_x * n_x
    A = [[row(i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    b = [row(nn + i) for i in range(n_x)]
    C = [[row(nn + n_x + i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    eta = [row(2 * nn + n_x + i) for i in range(n_x)]
    J = [[row(2 * nn + 2 * n_x + i * n_x + j) for j in range(n_x)]
         for i in range(n_x)]
    return A, b, C, eta, J


def _suffix_kernel(n_x: int, n_sweeps: int, in_ref, out_ref, scratch_ref):
    N = in_ref.shape[1]
    F = in_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    out_ref[:] = in_ref[:]

    def sweep(s, carry):
        d = 1 << s
        # Partner rows at k+d — per-row left-roll by d expressed as the
        # equivalent right-roll by N-d (pltpu.roll requires shift ≥ 0); the
        # identity padding and validity mask keep out-of-range lanes unchanged.
        Ei = _rows_of_ref(out_ref, n_x)
        Ej = _rows_of_ref(out_ref, n_x, roll_shift=N - d)
        En_rows = _combine_rows(Ei, Ej, n_x)
        valid = lane < (N - d)
        flat: List = []
        A, b, C, eta, J = En_rows
        for r in A:
            flat.extend(r)
        flat.extend(b)
        for r in C:
            flat.extend(r)
        flat.extend(eta)
        for r in J:
            flat.extend(r)
        # Masked row-by-row writes into scratch (out_ref rows are still being
        # read by later `flat` entries, so the update must not alias).
        for idx, new_row in enumerate(flat):
            scratch_ref[idx:idx + 1, :] = jnp.where(
                valid, new_row, out_ref[idx:idx + 1, :]
            )
        out_ref[:] = scratch_ref[:]
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)


# Largest per-block lane count the single-kernel scan handles inside the
# 16 MB VMEM scoped-stack budget (F=56 → ~0.9 MB per working-set copy at 4096
# lanes), leaving room for the grid pipeline's double buffering.
MAX_BLOCK_LANES = 2048


@functools.partial(jax.jit, static_argnames=("n_x", "interpret"))
def _suffix_scan_packed(packed: jnp.ndarray, n_x: int, interpret: bool = False):
    """Blocked suffix scan over the packed (F, n_pad) array.

    Each grid cell runs the full log2(block) recursive-doubling sweep on its
    own lane block — an independent *local* suffix scan per block (identity
    padding makes trailing lanes neutral).  Cross-block closure happens in
    `suffix_scan_pallas`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F, n_pad = packed.shape
    blk = min(n_pad, MAX_BLOCK_LANES)
    n_blocks = n_pad // blk
    n_sweeps = max((blk - 1).bit_length(), 1)
    kernel = functools.partial(_suffix_kernel, n_x, n_sweeps)
    flops_per_combine = 40 * n_x**3
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((F, n_pad), packed.dtype),
        in_specs=[pl.BlockSpec((F, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, blk), packed.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=n_sweeps * n_pad * flops_per_combine,
            bytes_accessed=2 * F * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed)


def suffix_scan_pallas(elems: RiccatiElement, interpret: bool = False) -> RiccatiElement:
    """Drop-in for `ilqr_tpu.ops.parallel_riccati.suffix_scan` (n_x ≤ 4)."""
    from ilqr_tpu.ops.parallel_riccati import combine, suffix_scan

    M = elems.A.shape[0]
    n_x = elems.A.shape[-1]
    if n_x > 4:
        return suffix_scan(elems)
    n_pad = max(-(-M // LANES) * LANES, LANES)
    if n_pad > MAX_BLOCK_LANES:
        # Blocked path: the lane axis must tile evenly into kernel blocks.
        n_pad = -(-n_pad // MAX_BLOCK_LANES) * MAX_BLOCK_LANES
    packed = pack_elements(elems, n_pad)
    out = _suffix_scan_packed(packed, n_x=n_x, interpret=interpret)
    local = unpack_elements(out, M, n_x)
    if n_pad <= MAX_BLOCK_LANES:
        return local

    # --- Cross-block closure (mirrors ilqr_tpu.parallel.horizon): ---
    # local[k] covers k .. end-of-block; close against the combined suffix of
    # all blocks to the right.
    blk = MAX_BLOCK_LANES
    n_blocks = n_pad // blk
    starts = jnp.arange(n_blocks) * blk
    totals = jax.tree_util.tree_map(
        lambda a: a[jnp.minimum(starts, M - 1)], local
    )
    # Identity-pad totals whose block starts beyond M (fully padded blocks).
    eye = jnp.broadcast_to(jnp.eye(n_x, dtype=elems.A.dtype),
                           (n_blocks, n_x, n_x))
    pad_blk = starts >= M
    totals = RiccatiElement(
        A=jnp.where(pad_blk[:, None, None], eye, totals.A),
        b=jnp.where(pad_blk[:, None], 0.0, totals.b),
        C=jnp.where(pad_blk[:, None, None], 0.0, totals.C),
        eta=jnp.where(pad_blk[:, None], 0.0, totals.eta),
        J=jnp.where(pad_blk[:, None, None], 0.0, totals.J),
    )
    # Suffix over the (few) block totals, shifted left by one block: the
    # boundary for block i is totals[i+1] ⊗ … ⊗ totals[n_blocks-1].
    suff_tot = suffix_scan(totals)
    ident = RiccatiElement(
        A=jnp.eye(n_x, dtype=elems.A.dtype),
        b=jnp.zeros(n_x, elems.A.dtype),
        C=jnp.zeros((n_x, n_x), elems.A.dtype),
        eta=jnp.zeros(n_x, elems.A.dtype),
        J=jnp.zeros((n_x, n_x), elems.A.dtype),
    )
    boundary = jax.tree_util.tree_map(
        lambda s, i: jnp.concatenate([s[1:], i[None]], axis=0),
        suff_tot, ident,
    )
    # Broadcast each block's boundary across its lanes and close.
    blk_idx = jnp.arange(M) // blk
    bcast = jax.tree_util.tree_map(lambda a: a[blk_idx], boundary)
    return combine(local, bcast)


@f32_matmuls
def backward_pass_pallas(
    exp: TrajectoryExpansion, reg: jnp.ndarray | float = 0.0, interpret: bool = False
):
    """Backward pass using the fused Pallas suffix scan; same contract as
    `ilqr_tpu.ops.riccati.backward_pass`."""
    reg = jnp.asarray(reg, dtype=exp.l_u.dtype)
    elems = make_elements(exp, reg)
    suffix = suffix_scan_pallas(elems, interpret=interpret)
    V_x = -suffix.eta[1:]
    V_xx = suffix.J[1:]
    u_ff, K, dVs = gains_from_value(exp, V_x, V_xx, reg)
    dV = jnp.sum(dVs, axis=0)
    ok = jnp.all(jnp.isfinite(u_ff)) & jnp.all(jnp.isfinite(K))
    return u_ff, K, dV, ok
