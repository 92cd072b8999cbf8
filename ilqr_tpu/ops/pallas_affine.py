"""Fused Pallas TPU kernel for multi-candidate affine prefix scans.

The defect-correction rollout (`ilqr_tpu.ops.parallel_rollout`) reduces each
line-search sweep to the affine recurrence δ_{k+1} = A_k δ_k + d_k.  Key
structural fact exploited here: the transition chain A_k = f_x + f_u K is the
SAME for every line-search candidate α — only the defect drive d differs.  So
instead of one (P, q) scan per α (10 redundant P-chains), this kernel scans a
single element stream

    e_k = (P_k,  q_k^{(1)}, …, q_k^{(A)})        with combine
    (P, q^a) ∘ (P', q'^a) = (P' P,  P' q^a + q'^a)

— one P-chain shared across all A candidates.  Per combine that is
n³ + A·n² multiplies vs A·(n³ + n²) for the replicated form (~2.5× less at
n=4, A=10), on top of the fused-kernel wins over `lax.associative_scan`
(documented in `ilqr_tpu.ops.pallas_riccati`).

Layout (round 4; mirrors the fused Riccati backward, which these choices
made 5-20× faster than the first lane-major revision — NOTES.md):

* **sublane-packed** (F, 8, L) blocks, t = s·L + l: every VPU op runs at
  full 8×128 tile occupancy instead of 1/8 for (1, N) field rows;
* the whole recursive-doubling PREFIX sweep runs inside one kernel (lane
  sweeps d = 1..L/2 via lane roll + sublane-carry select, then sublane
  sweeps d = L, 2L, 4L);
* **cross-block closure inside the kernel**: the grid walks blocks
  left-to-right (TPU grids execute sequentially) with the running prefix
  element carried in SMEM — the previous revision closed blocks with XLA
  small-matrix einsums over all N, which dominated its runtime (the same
  mistake the Riccati kernel fixed in round 3);
* δ₀ is **folded into the first drive** (q₀ ← q₀ + P₀ δ₀), so the output
  IS the q-field prefix: the kernel writes only the A·n drive rows back to
  HBM and the (N, n, n) prefix-product chain never leaves VMEM.

Recursive doubling for an inclusive PREFIX scan: with E⁰ = leaves, repeat for
d = 1, 2, 4, …:  E[k] ← E[k−d] ∘ E[k] (lanes k < d unchanged).  After
ceil(log2 N) sweeps E[k] = e_0 ∘ … ∘ e_k.  Right-padding lanes hold the
identity (P = I, q = 0) so block totals stay exact in the last partial block.

No reference counterpart — the reference's rollout is a strictly sequential
Python/`lax.scan` loop (`/root/reference/python/class_files/iLQR_class.py:164-247`).
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from ilqr_tpu.models.base import f32_matmuls

LANES = 128


def num_fields(n_x: int, n_cand: int) -> int:
    return n_x * n_x + n_cand * n_x


# ---------------------------------------------------------------------------
# Packing: (P: (N, n, n), q: (A, N, n))  <->  sublane-packed
# (F+1, 8, n_blocks·L) array, F = n² + A·n.  Row layout: P row-major first,
# then q candidate-major; the trailing row is the block index (vmap safety —
# see `pallas_riccati._blk_index_row`).
# ---------------------------------------------------------------------------

def pack_affine(P: jnp.ndarray, q: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Stack (P, q) fields into flat (F, n_pad), identity-padded on the right."""
    N, n_x = P.shape[0], P.shape[-1]
    A = q.shape[0]
    P_flat = P.reshape(N, n_x * n_x).T                       # (n_x², N)
    q_flat = jnp.moveaxis(q, 1, -1).reshape(A * n_x, N)      # (A·n_x, N)
    rows = jnp.concatenate([P_flat, q_flat], axis=0)
    F = rows.shape[0]
    out = jnp.zeros((F, n_pad), dtype=rows.dtype)
    out = out.at[:, :N].set(rows)
    pad_width = n_pad - N
    if pad_width > 0:
        eye_rows = jnp.eye(n_x, dtype=rows.dtype).reshape(-1)
        out = out.at[: n_x * n_x, N:].set(
            jnp.tile(eye_rows[:, None], (1, pad_width))
        )
    return out


def pack_affine_sub(P: jnp.ndarray, q: jnp.ndarray, n_blocks: int,
                    l_blk: int) -> jnp.ndarray:
    """(F+1, 8, n_blocks·l_blk), block-contiguous sublane layout."""
    from ilqr_tpu.ops.pallas_riccati import _blk_index_row

    flat = pack_affine(P, q, n_blocks * 8 * l_blk)
    F = flat.shape[0]
    packed = (
        flat.reshape(F, n_blocks, 8, l_blk)
        .transpose(0, 2, 1, 3)
        .reshape(F, 8, n_blocks * l_blk)
    )
    return jnp.concatenate(
        [packed, _blk_index_row(n_blocks, l_blk, packed.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# The kernel: row-symbolic combine (cf. ops.pallas_riccati's conventions —
# a matrix is a list of (8, L) row tiles; everything unrolls to elementwise
# VPU ops at trace time).
# ---------------------------------------------------------------------------

def _affine_fields(row_fn, n_x: int, n_cand: int):
    nn = n_x * n_x
    P = [[row_fn(i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    q = [[row_fn(nn + a * n_x + i) for i in range(n_x)] for a in range(n_cand)]
    return P, q


def _combine_affine(cur, part, n_x: int, n_cand: int) -> List:
    """E ← partner ∘ current (partner earlier): (P_c P_p, P_c q_p + q_c)."""
    P2, q2 = cur
    P1, q1 = part
    P_new = [
        [sum(P2[i][k] * P1[k][j] for k in range(n_x)) for j in range(n_x)]
        for i in range(n_x)
    ]
    q_new = [
        [sum(P2[i][k] * q1[a][k] for k in range(n_x)) + q2[a][i]
         for i in range(n_x)]
        for a in range(n_cand)
    ]
    flat: List = []
    for r in P_new:
        flat.extend(r)
    for qa in q_new:
        flat.extend(qa)
    return flat


def _prefix_kernel_sub(n_x: int, n_cand: int, l_blk: int, n_blocks: int,
                       in_ref, out_ref, work_ref, tmp_ref, bound_ref):
    """One (F, 8, l_blk) block: local prefix sweeps + SMEM-carried closure.

    The grid walks blocks LEFT-TO-RIGHT; `bound_ref` holds the combined
    prefix of every block to the left when this block runs.  The grid
    position comes from the block-index data row (vmap prepends a batch grid
    axis, which would shift `pl.program_id`; step == 0 re-seeds the carry
    per batch element)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = in_ref.shape[0] - 1
    nn = n_x * n_x
    step = in_ref[F, 0, 0].astype(jnp.int32)
    S = 8 * l_blk
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, l_blk), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, l_blk), 0)
    t_idx = sub * l_blk + lane

    work_ref[:] = in_ref[0:F, :, :]

    # Leftmost block: boundary = identity element (P = I, q = 0).
    @pl.when(step == 0)
    def _init_boundary():
        for f in range(F):
            diag = f < nn and (f // n_x) == (f % n_x)
            bound_ref[f, 0] = jnp.float32(1.0) if diag else jnp.float32(0.0)

    def _apply(partner_row, valid):
        cur = _affine_fields(lambda i: work_ref[i, :, :], n_x, n_cand)
        part = _affine_fields(partner_row, n_x, n_cand)
        flat = _combine_affine(cur, part, n_x, n_cand)
        # Masked row-by-row writes into tmp (work rows are still read by
        # later `flat` entries, so the update must not alias), then copy.
        for idx, new_row in enumerate(flat):
            if valid is None:
                tmp_ref[idx, :, :] = new_row
            else:
                tmp_ref[idx, :, :] = jnp.where(
                    valid, new_row, work_ref[idx, :, :])
        work_ref[:] = tmp_ref[:]

    def lane_sweep(s, carry):
        d = 1 << s

        def partner(i):
            r = work_ref[i, :, :]
            rr = pltpu.roll(r, shift=d, axis=1)      # lane right-roll by d
            rw = pltpu.roll(rr, shift=1, axis=0)     # sublane −1 carry
            return jnp.where(lane >= d, rr, rw)

        _apply(partner, t_idx >= d)
        return carry

    def sub_sweep(s, carry):
        m = 1 << s

        def partner(i):
            return pltpu.roll(work_ref[i, :, :], shift=m, axis=0)

        _apply(partner, t_idx >= m * l_blk)
        return carry

    n_lane_sweeps = (l_blk - 1).bit_length()  # d = 1 .. l_blk/2
    jax.lax.fori_loop(0, n_lane_sweeps, lane_sweep, 0)
    jax.lax.fori_loop(0, 3, sub_sweep, 0)     # d = L, 2L, 4L

    # Closure against the carried prefix of all earlier blocks.
    @pl.when(step > 0)
    def _apply_boundary():
        _apply(lambda i: bound_ref[i, 0], None)  # scalars, broadcast

    # New boundary = closed element at local t = S−1.
    @pl.when(step < n_blocks - 1)
    def _update_boundary():
        for f in range(F):
            bound_ref[f, 0] = work_ref[f, 7, l_blk - 1]

    # Only the drive rows leave the kernel (δ₀ folded into q₀, so the
    # q prefix IS the trajectory correction; the P chain stays in VMEM).
    out_ref[:] = work_ref[nn:nn + n_cand * n_x, :, :]


@functools.partial(jax.jit, static_argnames=("n_x", "n_cand", "l_blk",
                                             "interpret"))
def _prefix_scan_packed_sub(packed: jnp.ndarray, n_x: int, n_cand: int,
                            l_blk: int, interpret: bool = False):
    """Sublane-blocked prefix scan; returns the (A·n, 8, n_pad) drive rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F1, _, n_lanes = packed.shape
    F = F1 - 1
    n_blocks = n_lanes // l_blk
    n_out = n_cand * n_x
    kernel = functools.partial(_prefix_kernel_sub, n_x, n_cand, l_blk,
                               n_blocks)
    n_sweeps = (8 * l_blk - 1).bit_length() + 1
    flops_per_combine = 2 * (n_x**3 + n_cand * n_x**2)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((n_out, 8, n_lanes), packed.dtype),
        in_specs=[pl.BlockSpec((F1, 8, l_blk), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_out, 8, l_blk), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((F, 8, l_blk), packed.dtype),
            pltpu.VMEM((F, 8, l_blk), packed.dtype),
            pltpu.SMEM((F, 1), packed.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_sweeps * 8 * n_lanes * flops_per_combine,
            bytes_accessed=(F1 + n_out) * 8 * n_lanes * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def _combine_multi(e1, e2):
    """XLA-level combine; q carries the candidate axis at position -2."""
    P1, q1 = e1
    P2, q2 = e2
    P = P2 @ P1
    q = jnp.einsum("...ij,...aj->...ai", P2, q1) + q2
    return P, q


def _prefix_scan_xla(P: jnp.ndarray, q: jnp.ndarray):
    """(P: (N,n,n), q: (A,N,n)) -> inclusive prefix (P_scan, q_scan)."""
    q_t = jnp.moveaxis(q, 0, 1)                               # (N, A, n)
    Ps, qs = jax.lax.associative_scan(_combine_multi, (P, q_t), axis=0)
    return Ps, jnp.moveaxis(qs, 1, 0)


@f32_matmuls
def affine_prefix_scan_multi(
    P: jnp.ndarray,
    q: jnp.ndarray,
    delta0: jnp.ndarray,
    engine: str = "auto",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Solve δ_{k+1} = P_k δ_k + q_k^{(a)} for all candidates a at once.

    P: (N, n, n) shared transition chain; q: (A, N, n) per-candidate drives;
    delta0: (A, n) initial deltas.  Returns δ: (A, N+1, n) with δ[:, 0] = δ0.
    O(log N) depth; engine 'pallas' requires n ≤ 16 (row-symbolic QR
    inverse reach), 'auto' picks pallas on TPU for n ≤ 16, XLA otherwise.
    """
    from ilqr_tpu.ops.pallas_riccati import _resolve_interpret, _sub_blocking

    interpret = _resolve_interpret(interpret)
    N, n_x = P.shape[0], P.shape[-1]
    A = q.shape[0]
    if engine == "auto":
        on_tpu = jax.default_backend() == "tpu"
        engine = "pallas" if (on_tpu and n_x <= 16) else "xla"
    if engine == "pallas" and n_x > 16:
        engine = "xla"

    if engine == "xla":
        Ps, qs = _prefix_scan_xla(P, q)
        deltas = jnp.einsum("kij,aj->aki", Ps, delta0) + qs   # (A, N, n)
        return jnp.concatenate([delta0[:, None], deltas], axis=1)

    # δ₀ folded into the first drive: δ_{k+1} = (q-prefix)_k with δ₀ = 0,
    # so only the A·n drive rows come back from the kernel.
    F = num_fields(n_x, A)
    q0 = q[:, 0] + jnp.einsum("ij,aj->ai", P[0], delta0)
    q_adj = jnp.concatenate([q0[:, None], q[:, 1:]], axis=1)
    l_blk, n_blocks = _sub_blocking(
        N, vmem_rows=2 * (F + 1) + 2 * A * n_x + 2 * F)
    packed = pack_affine_sub(P, q_adj, n_blocks, l_blk)
    out = _prefix_scan_packed_sub(packed, n_x=n_x, n_cand=A, l_blk=l_blk,
                                  interpret=interpret)
    n_steps = n_blocks * 8 * l_blk
    flat = (
        out.reshape(A * n_x, 8, n_blocks, l_blk)
        .transpose(0, 2, 1, 3)
        .reshape(A * n_x, n_steps)
    )
    deltas = jnp.moveaxis(flat[:, :N].reshape(A, n_x, N), -1, 1)  # (A, N, n)
    return jnp.concatenate([delta0[:, None], deltas], axis=1)
