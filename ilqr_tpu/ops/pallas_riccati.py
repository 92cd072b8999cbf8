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


def _resolve_interpret(interpret):
    """None = interpret everywhere except TPU, so explicit-engine configs
    stay runnable (and smoke-testable) on CPU; compiled Mosaic on TPU."""
    return jax.default_backend() != "tpu" if interpret is None else interpret

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


def _inv_qr_rows(A):
    """Row-symbolic Householder-QR inverse for 5 ≤ n ≤ 16 (unrolled).

    Mirrors `ilqr_tpu.ops.smallmat._inv_qr`: backward stable with no
    pivoting (error ~cond·eps — the unpivoted block-Schur alternative loses
    ~2 digits when the leading block is ill-conditioned, VERDICT r1).  Every
    entry is an (8, l_blk) tile; ~2n³ elementwise VPU multiply-adds total,
    cheaper than block-Schur + Newton–Schulz refinement at these sizes.
    """
    n = len(A)
    tiny = 1e-30
    R = [list(row) for row in A]
    Qt = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]

    for k in range(n - 1):
        norm2 = sum(R[i][k] * R[i][k] for i in range(k, n))
        normx = jnp.sqrt(norm2)
        x0 = R[k][k]
        alpha = -jnp.where(x0 >= 0, 1.0, -1.0) * normx
        v = [R[i][k] for i in range(k, n)]
        v[0] = v[0] - alpha
        vnorm2 = sum(vi * vi for vi in v)
        beta = jnp.where(vnorm2 > tiny, 2.0 / jnp.maximum(vnorm2, tiny), 0.0)
        for Mmat in (R, Qt):
            for j in range(n):
                w = sum(v[i - k] * Mmat[i][j] for i in range(k, n))
                bw = beta * w
                for i in range(k, n):
                    Mmat[i][j] = Mmat[i][j] - v[i - k] * bw

    X = [[None] * n for _ in range(n)]
    for i in reversed(range(n)):
        inv_rii = 1.0 / R[i][i]
        for j in range(n):
            acc = Qt[i][j]
            for l in range(i + 1, n):
                acc = acc - R[i][l] * X[l][j]
            X[i][j] = acc * inv_rii
    return X


def _minv(A):
    n = len(A)
    if n <= 4:
        return {1: _inv1, 2: _inv2, 3: _inv3, 4: _inv4}[n](A)
    if n <= 16:
        return _inv_qr_rows(A)
    raise ValueError(f"row-symbolic inverse supports n <= 16, got {n}")


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

# ---------------------------------------------------------------------------
# Sublane-packed variant: time on BOTH sublanes and lanes.
#
# The (1, N) field rows of the layout above occupy one of the VPU's 8
# sublanes — 7/8 of every vector instruction is wasted.  Here each field is
# an (8, L) tile with timestep t = s·L + l (sublane-major chunks), so every
# combine op runs dense.  Recursive-doubling partners at t+d become:
#   d < L       : lane left-roll by d, with a sublane+1 carry for the lanes
#                 that wrap (select by lane index);
#   d = m·L     : pure sublane left-roll by m   (m = 1, 2, 4).
# Out-of-block partners are neutralized by the same identity-padding +
# validity-mask trick as the lane-major kernel.
# ---------------------------------------------------------------------------

# Lane width of one sublane-packed block: a block covers 8·L steps.  F=56 →
# 1.8 MB per working-set copy at L=1024; 3 copies + pipeline buffers fit the
# 16 MB VMEM budget.
MAX_SUB_LANES = 1024

# VMEM budget for all per-block buffers (double-buffered in/out + scratches);
# conservative slice of the ~16 MB scoped-stack limit.
VMEM_BUDGET_BYTES = 9 * 1024 * 1024


def _sub_blocking(M: int, vmem_rows: int | None = None) -> Tuple[int, int]:
    """(l_blk, n_blocks) for M elements.

    l_blk MUST be a power of two: the recursive-doubling schedule (lane
    sweeps d = 1..l_blk/2, then sublane sweeps d = l_blk, 2·l_blk, 4·l_blk)
    only composes DISJOINT suffix windows when l_blk is a power of two — a
    non-power-of-two width makes the d = l_blk sweep overlap the span already
    accumulated by the lane phase, double-counting elements under the
    non-idempotent combine (silently wrong gains at e.g. l_blk = 384).

    Round 4: l_blk is pinned to the minimum tile width (128 lanes = 1024
    steps/block).  Recursive doubling does S·log₂(S) combine work per
    S-step block, so SMALLER blocks do strictly less total work (10 sweeps
    at S=1024 vs 13 at the former VMEM-maximizing S=8192) while the
    sequential-grid SMEM closure stays one combine per element either way;
    measured on-chip at N=131k the fused backward dropped 1.21 ms → 0.74 ms
    and the affine prefix scan improved similarly — the longer grid's DMA
    pipelining is free.  ``vmem_rows`` is retained for API compatibility;
    at this width no supported field count exceeds the VMEM budget.
    """
    del vmem_rows
    l_blk = LANES
    n_blocks = -(-M // (8 * l_blk))
    return l_blk, n_blocks


def _blk_index_row(n_blocks: int, l_blk: int, dtype) -> jnp.ndarray:
    """(1, 8, n_blocks·l_blk) row holding each lane's block index.

    The kernels read their grid position from this data row rather than
    `pl.program_id`: under vmap the batch axis is prepended to the grid,
    which would silently shift what program_id(0) means, while a data row
    is batched along with the rest of the operand.
    """
    row = jnp.repeat(jnp.arange(n_blocks, dtype=dtype), l_blk)
    return jnp.broadcast_to(row, (1, 8, n_blocks * l_blk))


def pack_elements_sub(elems: RiccatiElement, n_blocks: int, l_blk: int) -> jnp.ndarray:
    """(F+1, 8, n_blocks·l_blk), block-contiguous: block i holds steps
    [i·8·l_blk, (i+1)·8·l_blk) at lanes [i·l_blk, (i+1)·l_blk), laid out
    t_local = s·l_blk + l.  The extra trailing row is the block index."""
    F_rows = pack_elements(elems, n_blocks * 8 * l_blk)  # (F, n_pad) flat
    F = F_rows.shape[0]
    packed = (
        F_rows.reshape(F, n_blocks, 8, l_blk)
        .transpose(0, 2, 1, 3)
        .reshape(F, 8, n_blocks * l_blk)
    )
    return jnp.concatenate(
        [packed, _blk_index_row(n_blocks, l_blk, packed.dtype)], axis=0
    )


def unpack_elements_sub(
    packed: jnp.ndarray, M: int, n_x: int, n_blocks: int, l_blk: int
) -> RiccatiElement:
    F = packed.shape[0]
    flat = (
        packed.reshape(F, 8, n_blocks, l_blk)
        .transpose(0, 2, 1, 3)
        .reshape(F, n_blocks * 8 * l_blk)
    )
    return unpack_elements(flat, M, n_x)


def _element_fields(row_fn, n_x: int):
    """Row-symbolic (A, b, C, eta, J) views in the packed element layout."""
    nn = n_x * n_x
    A = [[row_fn(i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    b = [row_fn(nn + i) for i in range(n_x)]
    C = [[row_fn(nn + n_x + i * n_x + j) for j in range(n_x)]
         for i in range(n_x)]
    eta = [row_fn(2 * nn + n_x + i) for i in range(n_x)]
    J = [[row_fn(2 * nn + 2 * n_x + i * n_x + j) for j in range(n_x)]
         for i in range(n_x)]
    return A, b, C, eta, J


def _flatten_element(rows) -> List:
    A, b, C, eta, J = rows
    flat: List = []
    for r in A:
        flat.extend(r)
    flat.extend(b)
    for r in C:
        flat.extend(r)
    flat.extend(eta)
    for r in J:
        flat.extend(r)
    return flat


def _scan_block(n_x: int, l_blk: int, step, work_ref, scratch_ref, bound_ref):
    """Shared per-block machinery: seed the SMEM boundary carry at grid step
    0, run the local recursive-doubling suffix sweeps over `work_ref`, and
    close against the carried boundary.  Does NOT update the carry — callers
    may still need the pre-update boundary (the fused kernel reads it for the
    V(k+1) shift) and call `_update_carry` afterwards.

    l_blk must be a power of two (see `_sub_blocking`).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert l_blk & (l_blk - 1) == 0, "sweep schedule needs power-of-two l_blk"
    S = 8 * l_blk
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, l_blk), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, l_blk), 0)
    t_idx = sub * l_blk + lane
    F = _num_fields(n_x)
    nn = n_x * n_x

    # Rightmost block: boundary = identity element (A = I, rest 0).
    @pl.when(step == 0)
    def _init_boundary():
        for f in range(F):
            diag = f < nn and (f // n_x) == (f % n_x)
            bound_ref[f, 0] = jnp.float32(1.0) if diag else jnp.float32(0.0)

    def _apply(d, partner_row, valid):
        Ei = _element_fields(lambda i: work_ref[i, :, :], n_x)
        Ej = _element_fields(partner_row, n_x)
        flat = _flatten_element(_combine_rows(Ei, Ej, n_x))
        # Masked row-by-row writes into scratch (work rows are still read by
        # later `flat` entries, so the update must not alias), then copy back.
        for idx, new_row in enumerate(flat):
            if valid is None:
                scratch_ref[idx, :, :] = new_row
            else:
                scratch_ref[idx, :, :] = jnp.where(
                    valid, new_row, work_ref[idx, :, :])
        work_ref[:] = scratch_ref[:]

    def lane_sweep(s, carry):
        d = 1 << s

        def partner(i):
            r = work_ref[i, :, :]
            rl = pltpu.roll(r, shift=l_blk - d, axis=1)   # lane left-roll by d
            rw = pltpu.roll(rl, shift=7, axis=0)          # sublane +1 carry
            return jnp.where(lane < l_blk - d, rl, rw)

        _apply(d, partner, t_idx < (S - d))
        return carry

    def sub_sweep(s, carry):
        m = 1 << s

        def partner(i):
            return pltpu.roll(work_ref[i, :, :], shift=8 - m, axis=0)

        _apply(m * l_blk, partner, t_idx < (S - m * l_blk))
        return carry

    n_lane_sweeps = (l_blk - 1).bit_length()  # d = 1 .. l_blk/2
    jax.lax.fori_loop(0, n_lane_sweeps, lane_sweep, 0)
    jax.lax.fori_loop(0, 3, sub_sweep, 0)     # d = l_blk, 2·l_blk, 4·l_blk

    # --- Closure: combine every element with the carried boundary. ---
    # The rightmost block (grid step 0) has an identity boundary — skip.
    @pl.when(step > 0)
    def _apply_boundary():
        _apply(0, lambda i: bound_ref[i, 0], None)  # scalars, broadcast


def _update_carry(n_x: int, n_blocks: int, step, work_ref, bound_ref):
    """New boundary = closed element at local t = 0 (this block .. end); not
    needed after the leftmost block (the final grid step)."""
    import jax.experimental.pallas as pl

    @pl.when(step < n_blocks - 1)
    def _update_boundary():
        for f in range(_num_fields(n_x)):
            bound_ref[f, 0] = work_ref[f, 0, 0]


def _suffix_kernel_sub(n_x: int, l_blk: int, n_blocks: int, in_ref,
                       out_ref, scratch_ref, bound_ref):
    """Local recursive-doubling suffix scan over one (F, 8, l_blk) block, then
    closure against the running boundary element carried in SMEM.

    The grid walks blocks RIGHT-TO-LEFT (reversed index map) and TPU grids
    execute sequentially, so `bound_ref` holds the combined suffix of every
    block to the right when this block runs — no separate XLA closure pass.
    The grid position is read from the block-index data row of `in_ref`, NOT
    from `pl.program_id` — vmap prepends a batch grid axis, which would shift
    the axis program_id refers to (and the step==0 init in `_scan_block`
    re-seeds the carry at the start of every batch element, so the SMEM
    scratch never leaks across the batch).
    """
    F = in_ref.shape[0] - 1  # trailing row = block index
    step = (n_blocks - 1) - in_ref[F, 0, 0].astype(jnp.int32)  # reversed position
    out_ref[:] = in_ref[0:F, :, :]
    _scan_block(n_x, l_blk, step, out_ref, scratch_ref, bound_ref)
    _update_carry(n_x, n_blocks, step, out_ref, bound_ref)


@functools.partial(jax.jit, static_argnames=("n_x", "l_blk", "interpret"))
def _suffix_scan_packed_sub(
    packed: jnp.ndarray, n_x: int, l_blk: int, interpret: bool = False
):
    """Blocked local suffix scans over the sublane-packed (F, 8, n_pad) array."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F1, _, n_lanes = packed.shape  # F data rows + 1 block-index row
    F = F1 - 1
    n_blocks = n_lanes // l_blk
    n_sweeps = (8 * l_blk - 1).bit_length()
    kernel = functools.partial(_suffix_kernel_sub, n_x, l_blk, n_blocks)
    flops_per_combine = 40 * n_x**3
    rev = lambda i: (0, 0, n_blocks - 1 - i)  # right-to-left for the closure carry
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((F, 8, n_lanes), packed.dtype),
        in_specs=[pl.BlockSpec((F1, 8, l_blk), rev, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F, 8, l_blk), rev, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((F, 8, l_blk), packed.dtype),
            pltpu.SMEM((F, 1), packed.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(n_sweeps + 1) * 8 * n_lanes * flops_per_combine,
            bytes_accessed=2 * F * 8 * n_lanes * 4,
            transcendentals=0,
        ),
        # n_x = 16 puts the fused working set ~100 KB over the default
        # 16 MB scoped-VMEM limit; v5e has 128 MB — raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed)


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
        # n_x = 16 puts the fused working set ~100 KB over the default
        # 16 MB scoped-VMEM limit; v5e has 128 MB — raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed)


def _close_blocks(local: RiccatiElement, M: int, n_x: int, blk: int,
                  n_blocks: int) -> RiccatiElement:
    """Cross-block closure (mirrors ilqr_tpu.parallel.horizon): local[k]
    covers k .. end-of-its-block (blocks of `blk` steps); close against the
    combined suffix of all blocks to the right."""
    from ilqr_tpu.ops.parallel_riccati import combine, suffix_scan

    elems = local
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


def suffix_scan_pallas(
    elems: RiccatiElement, interpret: bool | None = None, layout: str = "sub"
) -> RiccatiElement:
    """Drop-in for `ilqr_tpu.ops.parallel_riccati.suffix_scan` (n_x ≤ 16,
    the reach of the row-symbolic QR inverse; at the round-4 fixed
    l_blk = 128 the VMEM working set stays in budget through n_x = 16 —
    larger n_x falls back to the XLA associative scan).

    layout='sub' (default): sublane-packed kernel, fully dense VPU tiles.
    layout='lane': original (1, N)-row kernel.
    """
    from ilqr_tpu.ops.parallel_riccati import suffix_scan

    interpret = _resolve_interpret(interpret)
    M = elems.A.shape[0]
    n_x = elems.A.shape[-1]
    if n_x > 16:
        return suffix_scan(elems)

    if layout == "sub":
        F = _num_fields(n_x)
        l_blk, n_blocks = _sub_blocking(M, vmem_rows=2 * (F + 1) + 2 * F)
        packed = pack_elements_sub(elems, n_blocks, l_blk)
        out = _suffix_scan_packed_sub(packed, n_x=n_x, l_blk=l_blk,
                                      interpret=interpret)
        # Cross-block closure happens inside the kernel (SMEM boundary carry).
        return unpack_elements_sub(out, M, n_x, n_blocks, l_blk)

    n_pad = max(-(-M // LANES) * LANES, LANES)
    if n_pad > MAX_BLOCK_LANES:
        # Blocked path: the lane axis must tile evenly into kernel blocks.
        n_pad = -(-n_pad // MAX_BLOCK_LANES) * MAX_BLOCK_LANES
    packed = pack_elements(elems, n_pad)
    out = _suffix_scan_packed(packed, n_x=n_x, interpret=interpret)
    local = unpack_elements(out, M, n_x)
    if n_pad <= MAX_BLOCK_LANES:
        return local
    return _close_blocks(local, M, n_x, MAX_BLOCK_LANES, n_pad // MAX_BLOCK_LANES)


# ---------------------------------------------------------------------------
# Fully fused backward pass: ONE kernel from packed trajectory expansion to
# packed gains.  Per block (right-to-left grid):
#   1. build the Riccati elements from the raw expansion rows (dense VPU),
#      with terminal/identity masking by global step index;
#   2. local recursive-doubling suffix scan (as _suffix_kernel_sub);
#   3. closure against the SMEM boundary carry;
#   4. V(k+1) by a d=1 partner shift (block-boundary lane fed by the carry);
#   5. Q-expansion + 2×2 gain solve → u_ff, K, per-step dV terms.
# Eliminates the XLA make_elements / pack / unpack / gains stages that
# dominated the unfused pipeline (measured: they were ~70% of wall-clock).
# ---------------------------------------------------------------------------


def _exp_rows(row_fn, n_x: int, n_u: int):
    """Row-symbolic views of the packed expansion fields, layout must match
    pack_expansion_sub."""
    o = 0
    f_x = [[row_fn(i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    o += n_x * n_x
    f_u = [[row_fn(o + i * n_u + j) for j in range(n_u)] for i in range(n_x)]
    o += n_x * n_u
    l_x = [row_fn(o + i) for i in range(n_x)]
    o += n_x
    l_u = [row_fn(o + i) for i in range(n_u)]
    o += n_u
    l_xx = [[row_fn(o + i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    o += n_x * n_x
    l_ux = [[row_fn(o + i * n_x + j) for j in range(n_x)] for i in range(n_u)]
    o += n_u * n_x
    l_uu = [[row_fn(o + i * n_u + j) for j in range(n_u)] for i in range(n_u)]
    return f_x, f_u, l_x, l_u, l_xx, l_ux, l_uu


def pack_expansion_sub(exp: TrajectoryExpansion, n_blocks: int, l_blk: int,
                       defects=None):
    """(Fe, 8, n_blocks·l_blk) packed expansion; column N carries the terminal
    (v_x in the l_x rows, v_xx in the l_xx rows), padding columns are zero.
    With ``defects`` (GNMS gaps, (N, n_x)), n_x extra rows are appended after
    l_uu (zero terminal column)."""
    N, n_x = exp.f_x.shape[0], exp.f_x.shape[-1]
    n_u = exp.l_u.shape[-1]
    n_pad = n_blocks * 8 * l_blk

    def rows_of(a, width):
        return a.reshape(N, width).T

    term_cols = [
        jnp.zeros((n_x * n_x,)), jnp.zeros((n_x * n_u,)),
        exp.v_x, jnp.zeros((n_u,)),
        exp.v_xx.reshape(-1), jnp.zeros((n_u * n_x,)), jnp.zeros((n_u * n_u,)),
    ]
    stage_rows = [
        rows_of(exp.f_x, n_x * n_x), rows_of(exp.f_u, n_x * n_u),
        exp.l_x.T, exp.l_u.T,
        rows_of(exp.l_xx, n_x * n_x), rows_of(exp.l_ux, n_u * n_x),
        rows_of(exp.l_uu, n_u * n_u),
    ]
    if defects is not None:
        term_cols.append(jnp.zeros((n_x,)))
        stage_rows.append(defects.T)
    rows = jnp.concatenate(
        [jnp.concatenate([s, t[:, None].astype(s.dtype)], axis=1)
         for s, t in zip(stage_rows, term_cols)], axis=0
    )  # (Fe, N+1)
    Fe = rows.shape[0]
    out = jnp.zeros((Fe, n_pad), dtype=rows.dtype).at[:, : N + 1].set(rows)
    packed = (
        out.reshape(Fe, n_blocks, 8, l_blk)
        .transpose(0, 2, 1, 3)
        .reshape(Fe, 8, n_blocks * l_blk)
    )
    return jnp.concatenate(
        [packed, _blk_index_row(n_blocks, l_blk, packed.dtype)], axis=0
    )


def _fused_kernel(n_x: int, n_u: int, l_blk: int, M: int, n_blocks: int,
                  with_defects: bool,
                  reg_ref, in_ref, out_ref, elem_ref, scratch_ref,
                  bound_ref):
    from jax.experimental.pallas import tpu as pltpu

    S = 8 * l_blk
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, l_blk), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, l_blk), 0)
    t_loc = sub * l_blk + lane
    nn = n_x * n_x
    reg = reg_ref[0, 0]
    # Grid position from the block-index data row, not pl.program_id — stays
    # correct under vmap (the batch axis is prepended to the grid), and the
    # step==0 init in _scan_block re-seeds the carry per batch element.
    Fe_last = in_ref.shape[0] - 1
    step = (n_blocks - 1) - in_ref[Fe_last, 0, 0].astype(jnp.int32)

    blk = n_blocks - 1 - step
    t_glob = t_loc + blk * S
    is_leaf = t_glob < M - 1
    is_term = t_glob == M - 1

    # --- 1. Elements from the expansion (dense; masked per position). ---
    f_x, f_u, l_x, l_u, l_xx, l_ux, l_uu = _exp_rows(
        lambda i: in_ref[i, :, :], n_x, n_u)
    # GNMS defect rows live after the expansion fields (pack_expansion_sub);
    # padding/terminal columns are zero so no extra masking is needed.
    d_off = 2 * nn + n_x * n_u + n_x + n_u + n_u * n_x + n_u * n_u
    d_rows = ([in_ref[d_off + i, :, :] for i in range(n_x)]
              if with_defects else None)
    R = [[l_uu[i][j] + (reg if i == j else 0.0) for j in range(n_u)]
         for i in range(n_u)]
    Ri = _minv(R)
    RiM = _mmul(Ri, l_ux)                     # (n_u, n_x)
    RiBt = _mmul(Ri, _mT(f_u))                # (n_u, n_x)
    Rir = _mvec(Ri, l_u)                      # (n_u,)
    fuRiM = _mmul(f_u, RiM)
    A_l = [[f_x[i][j] - fuRiM[i][j] for j in range(n_x)] for i in range(n_x)]
    b_l = [-v for v in _mvec(f_u, Rir)]
    if with_defects:
        b_l = [b_l[i] + d_rows[i] for i in range(n_x)]
    C_l = _msym(_mmul(f_u, RiBt))
    MtRiM = _mmul(_mT(l_ux), RiM)
    J_l = _msym([[l_xx[i][j] - MtRiM[i][j] for j in range(n_x)]
                 for i in range(n_x)])
    Mt_Rir = _mvec(_mT(l_ux), Rir)
    eta_l = [-(l_x[i] - Mt_Rir[i]) for i in range(n_x)]

    def sel(leaf_row, term_row, ident_const):
        base = jnp.where(is_term, term_row, ident_const) if term_row is not None \
            else jnp.where(is_term, 0.0, ident_const)
        return jnp.where(is_leaf, leaf_row, base)

    zero = jnp.zeros((8, l_blk), dtype=jnp.float32)
    elem_rows: List = []
    for i in range(n_x):
        for j in range(n_x):
            elem_rows.append(sel(A_l[i][j], None, 1.0 if i == j else 0.0))
    for i in range(n_x):
        elem_rows.append(sel(b_l[i], None, 0.0))
    for i in range(n_x):
        for j in range(n_x):
            elem_rows.append(sel(C_l[i][j], None, 0.0))
    for i in range(n_x):
        elem_rows.append(sel(eta_l[i], -l_x[i], 0.0))   # terminal η = −v_x
    for i in range(n_x):
        for j in range(n_x):
            elem_rows.append(sel(J_l[i][j], l_xx[i][j], 0.0))  # terminal J = v_xx
    for idx, r in enumerate(elem_rows):
        elem_ref[idx, :, :] = r
    del elem_rows

    # --- 2+3. Local suffix sweeps + closure (shared with the scan kernel;
    # carry seeding at step 0 happens inside _scan_block). ---
    _scan_block(n_x, l_blk, step, elem_ref, scratch_ref, bound_ref)

    # --- 4. V at k+1: d=1 partner of the closed elements; the block's last
    # position is fed by the (pre-update) boundary carry. ---
    def vnext_row(i):
        r = elem_ref[i, :, :]
        rl = pltpu.roll(r, shift=l_blk - 1, axis=1)
        rw = pltpu.roll(rl, shift=7, axis=0)
        shifted = jnp.where(lane < l_blk - 1, rl, rw)
        return jnp.where(t_loc < S - 1, shifted, bound_ref[i, 0])

    eta_n = [vnext_row(2 * nn + n_x + i) for i in range(n_x)]
    J_n = [[vnext_row(2 * nn + 2 * n_x + i * n_x + j) for j in range(n_x)]
           for i in range(n_x)]

    # --- 5. Boundary carry update for the next (left) block. ---
    _update_carry(n_x, n_blocks, step, elem_ref, bound_ref)

    # --- 6. Gains: Q-expansion at k against V(k+1) = (J_n, −eta_n).  With
    # GNMS defects the linear term shifts: W = V_x(k+1) + V_xx(k+1)·d_k. ---
    v_x = [-e for e in eta_n]
    if with_defects:
        Jd = _mvec(J_n, d_rows)
        v_x = [v_x[i] + Jd[i] for i in range(n_x)]
    fuT = _mT(f_u)                                  # (n_u, n_x)
    fuT_Vxx = _mmul(fuT, J_n)                       # (n_u, n_x)
    Q_u = _vadd(l_u, _mvec(fuT, v_x))               # (n_u,)
    Q_ux = _madd(l_ux, _mmul(fuT_Vxx, f_x))         # (n_u, n_x)
    Q_uu = _madd(l_uu, _mmul(fuT_Vxx, f_u))
    Q_uu = _msym([[Q_uu[i][j] + (reg if i == j else 0.0) for j in range(n_u)]
                  for i in range(n_u)])
    Qi = _minv(Q_uu)
    K = [[-v for v in row] for row in _mmul(Qi, Q_ux)]     # (n_u, n_x)
    u_ff = [-v for v in _mvec(Qi, Q_u)]                    # (n_u,)
    dV1 = sum(u_ff[i] * Q_u[i] for i in range(n_u))
    quu_uff = _mvec(Q_uu, u_ff)
    dV2 = 0.5 * (sum(u_ff[i] * quu_uff[i] for i in range(n_u))
                 - reg * sum(u_ff[i] * u_ff[i] for i in range(n_u)))

    # Zero the non-stage positions so the XLA-side dV reduction is a plain sum.
    out_rows: List = []
    for i in range(n_u):
        out_rows.append(u_ff[i])
    for i in range(n_u):
        for j in range(n_x):
            out_rows.append(K[i][j])
    out_rows.append(dV1)
    out_rows.append(dV2)
    for idx, r in enumerate(out_rows):
        out_ref[idx, :, :] = jnp.where(is_leaf, r, zero)


@functools.partial(jax.jit, static_argnames=(
    "n_x", "n_u", "M", "l_blk", "with_defects", "interpret"))
def _fused_backward_packed(packed, reg, n_x: int, n_u: int, M: int,
                           l_blk: int, with_defects: bool = False,
                           interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Fe1, _, n_lanes = packed.shape  # expansion rows + 1 block-index row
    n_blocks = n_lanes // l_blk
    F = _num_fields(n_x)
    Fo = n_u + n_u * n_x + 2
    kernel = functools.partial(_fused_kernel, n_x, n_u, l_blk, M, n_blocks,
                               with_defects)
    rev = lambda i: (0, 0, n_blocks - 1 - i)
    n_sweeps = (8 * l_blk - 1).bit_length() + 2
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((Fo, 8, n_lanes), packed.dtype),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Fe1, 8, l_blk), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Fo, 8, l_blk), rev, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((F, 8, l_blk), packed.dtype),
            pltpu.VMEM((F, 8, l_blk), packed.dtype),
            pltpu.SMEM((F, 1), packed.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_sweeps * 8 * n_lanes * 40 * n_x**3,
            bytes_accessed=(Fe1 + Fo) * 8 * n_lanes * 4,
            transcendentals=0,
        ),
        # n_x = 16 puts the fused working set ~100 KB over the default
        # 16 MB scoped-VMEM limit; v5e has 128 MB — raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(reg.reshape(1, 1), packed)


@f32_matmuls
def backward_pass_pallas_fused(
    exp: TrajectoryExpansion, reg: jnp.ndarray | float = 0.0,
    interpret: bool | None = None, defects=None,
):
    """Fully fused Pallas backward pass; same contract as
    `ilqr_tpu.ops.riccati.backward_pass` (n_x ≤ 12, n_u ≤ 6 — the VMEM-
    driven cap of `suffix_scan_pallas`), incl. the GNMS ``defects`` variant
    (`ilqr_tpu.shooting`)."""
    from ilqr_tpu.ops.parallel_riccati import backward_pass_associative

    interpret = _resolve_interpret(interpret)
    N, n_x = exp.f_x.shape[0], exp.f_x.shape[-1]
    n_u = exp.l_u.shape[-1]
    if n_x > 16 or n_u > 6:
        return backward_pass_associative(exp, reg, defects=defects)
    M = N + 1
    F = _num_fields(n_x)
    Fe = (2 * n_x * n_x + n_x * n_u + n_x + n_u + n_u * n_x + n_u * n_u
          + (n_x if defects is not None else 0))
    Fo = n_u + n_u * n_x + 2
    l_blk, n_blocks = _sub_blocking(
        M, vmem_rows=2 * (Fe + 1 + Fo) + 2 * F)
    n_steps = n_blocks * 8 * l_blk

    reg = jnp.asarray(reg, dtype=exp.l_u.dtype)
    packed = pack_expansion_sub(exp, n_blocks, l_blk, defects=defects)
    out = _fused_backward_packed(packed, reg, n_x=n_x, n_u=n_u, M=M,
                                 l_blk=l_blk,
                                 with_defects=defects is not None,
                                 interpret=interpret)
    Fo = out.shape[0]
    flat = (
        out.reshape(Fo, 8, n_blocks, l_blk)
        .transpose(0, 2, 1, 3)
        .reshape(Fo, n_steps)
    )
    u_ff = flat[:n_u, :N].T                                   # (N, n_u)
    K = flat[n_u:n_u + n_u * n_x, :N].T.reshape(N, n_u, n_x)  # (N, n_u, n_x)
    dV = jnp.sum(flat[n_u + n_u * n_x:, :], axis=1)           # (2,)
    ok = jnp.all(jnp.isfinite(u_ff)) & jnp.all(jnp.isfinite(K))
    return u_ff, K, dV, ok


@f32_matmuls
def backward_pass_pallas(
    exp: TrajectoryExpansion, reg: jnp.ndarray | float = 0.0,
    interpret: bool | None = None, layout: str = "sub", defects=None,
):
    """Backward pass using the fused Pallas suffix scan; same contract as
    `ilqr_tpu.ops.riccati.backward_pass` (incl. the GNMS ``defects``
    variant — see `parallel_riccati.backward_pass_associative`)."""
    reg = jnp.asarray(reg, dtype=exp.l_u.dtype)
    elems = make_elements(exp, reg, defects=defects)
    suffix = suffix_scan_pallas(elems, interpret=interpret, layout=layout)
    V_x = -suffix.eta[1:]
    V_xx = suffix.J[1:]
    if defects is not None:
        V_x = V_x + (V_xx @ defects[..., None])[..., 0]
    u_ff, K, dVs = gains_from_value(exp, V_x, V_xx, reg)
    dV = jnp.sum(dVs, axis=0)
    ok = jnp.all(jnp.isfinite(u_ff)) & jnp.all(jnp.isfinite(K))
    return u_ff, K, dV, ok
