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
(documented in `ilqr_tpu.ops.pallas_riccati`): field-major (F, N) packing with
time along TPU lanes, the whole ceil(log2 N) recursive-doubling sweep in one
kernel with the working set in VMEM, pure elementwise VPU arithmetic.

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

# Same VMEM scoped-stack budget reasoning as ops.pallas_riccati: F ≤ 56 rows
# at 2048 lanes ≈ 0.46 MB per working-set copy.
MAX_BLOCK_LANES = 2048


# ---------------------------------------------------------------------------
# Packing: (P: (N, n, n), q: (A, N, n))  <->  (F, n_pad) field-major array,
# F = n² + A·n.  Row layout: P row-major first, then q candidate-major.
# ---------------------------------------------------------------------------

def num_fields(n_x: int, n_cand: int) -> int:
    return n_x * n_x + n_cand * n_x


def pack_affine(P: jnp.ndarray, q: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Stack (P, q) fields into (F, n_pad), identity-padded on the right."""
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


def unpack_affine(packed: jnp.ndarray, N: int, n_x: int, n_cand: int):
    nn = n_x * n_x
    P = packed[:nn, :N].T.reshape(N, n_x, n_x)
    q = packed[nn:nn + n_cand * n_x, :N].reshape(n_cand, n_x, N)
    return P, jnp.moveaxis(q, -1, 1)                          # (A, N, n_x)


# ---------------------------------------------------------------------------
# The kernel: row-symbolic combine (cf. ops.pallas_riccati's conventions —
# a matrix is a list-of-lists of (1, N) row vectors; everything unrolls to
# elementwise VPU ops at trace time).
# ---------------------------------------------------------------------------

def _rows_of_ref(ref, n_x, n_cand, roll_shift=None):
    from jax.experimental.pallas import tpu as pltpu

    def row(i):
        r = ref[i:i + 1, :]
        if roll_shift is not None:
            r = pltpu.roll(r, shift=roll_shift, axis=1)
        return r

    nn = n_x * n_x
    P = [[row(i * n_x + j) for j in range(n_x)] for i in range(n_x)]
    q = [[row(nn + a * n_x + i) for i in range(n_x)] for a in range(n_cand)]
    return P, q


def _prefix_kernel(n_x: int, n_cand: int, n_sweeps: int,
                   in_ref, out_ref, scratch_ref):
    N = in_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    out_ref[:] = in_ref[:]

    def sweep(s, carry):
        d = 1 << s
        # Earlier partner at k−d: per-row right-roll by d.  Lanes k < d keep
        # their current value (validity mask below).
        P1, q1 = _rows_of_ref(out_ref, n_x, n_cand, roll_shift=d)
        P2, q2 = _rows_of_ref(out_ref, n_x, n_cand)
        # (P2 P1, P2 q1 + q2) — composition earlier-then-later.
        P_new = [
            [sum(P2[i][k] * P1[k][j] for k in range(n_x)) for j in range(n_x)]
            for i in range(n_x)
        ]
        q_new = [
            [sum(P2[i][k] * q1[a][k] for k in range(n_x)) + q2[a][i]
             for i in range(n_x)]
            for a in range(n_cand)
        ]
        valid = lane >= d
        flat: List = []
        for r in P_new:
            flat.extend(r)
        for qa in q_new:
            flat.extend(qa)
        # Masked row-by-row writes into scratch (must not alias out_ref while
        # its rows feed later reads), then copy back.
        for idx, new_row in enumerate(flat):
            scratch_ref[idx:idx + 1, :] = jnp.where(
                valid, new_row, out_ref[idx:idx + 1, :]
            )
        out_ref[:] = scratch_ref[:]
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)


@functools.partial(jax.jit, static_argnames=("n_x", "n_cand", "interpret"))
def _prefix_scan_packed(packed: jnp.ndarray, n_x: int, n_cand: int,
                        interpret: bool = False):
    """Blocked local prefix scan over the packed (F, n_pad) array.

    Each grid cell computes an independent prefix scan of its own lane block;
    cross-block closure happens in `affine_prefix_scan_multi`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F, n_pad = packed.shape
    blk = min(n_pad, MAX_BLOCK_LANES)
    n_blocks = n_pad // blk
    n_sweeps = max((blk - 1).bit_length(), 1)
    kernel = functools.partial(_prefix_kernel, n_x, n_cand, n_sweeps)
    flops_per_combine = 2 * (n_x**3 + n_cand * n_x**2)
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
    interpret: bool = False,
) -> jnp.ndarray:
    """Solve δ_{k+1} = P_k δ_k + q_k^{(a)} for all candidates a at once.

    P: (N, n, n) shared transition chain; q: (A, N, n) per-candidate drives;
    delta0: (A, n) initial deltas.  Returns δ: (A, N+1, n) with δ[:, 0] = δ0.
    O(log N) depth; engine 'pallas' requires n ≤ 12 (lane-major kernel),
    'auto' picks pallas on TPU for n ≤ 12 and XLA associative scan otherwise.
    """
    N, n_x = P.shape[0], P.shape[-1]
    A = q.shape[0]
    if engine == "auto":
        on_tpu = jax.default_backend() == "tpu"
        engine = "pallas" if (on_tpu and n_x <= 12) else "xla"
    if engine == "pallas" and n_x > 12:
        engine = "xla"

    if engine == "xla":
        Ps, qs = _prefix_scan_xla(P, q)
    else:
        n_pad = max(-(-N // LANES) * LANES, LANES)
        if n_pad > MAX_BLOCK_LANES:
            n_pad = -(-n_pad // MAX_BLOCK_LANES) * MAX_BLOCK_LANES
        packed = pack_affine(P, q, n_pad)
        out = _prefix_scan_packed(packed, n_x=n_x, n_cand=A,
                                  interpret=interpret)
        Ps, qs = unpack_affine(out, N, n_x, A)
        blk = MAX_BLOCK_LANES
        if n_pad > blk:
            # Cross-block closure: local[k in block i] covers only its block;
            # close with the exclusive prefix of per-block totals.
            n_blocks = n_pad // blk
            ends = jnp.minimum((jnp.arange(n_blocks) + 1) * blk, N) - 1
            tot_P = Ps[ends]                                  # (B, n, n)
            tot_q = qs[:, ends]                               # (A, B, n)
            cp, cq = _prefix_scan_xla(tot_P, tot_q)
            eyeP = jnp.eye(n_x, dtype=P.dtype)
            carry_P = jnp.concatenate([eyeP[None], cp[:-1]], axis=0)
            carry_q = jnp.concatenate(
                [jnp.zeros_like(cq[:, :1]), cq[:, :-1]], axis=1
            )
            blk_idx = jnp.arange(N) // blk
            cP = carry_P[blk_idx]                             # (N, n, n)
            cq_l = carry_q[:, blk_idx]                        # (A, N, n)
            qs = jnp.einsum("kij,akj->aki", Ps, cq_l) + qs
            Ps = Ps @ cP

    deltas = jnp.einsum("kij,aj->aki", Ps, delta0) + qs       # (A, N, n)
    return jnp.concatenate([delta0[:, None], deltas], axis=1)
