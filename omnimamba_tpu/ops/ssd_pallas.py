"""Fused chunked-SSD Pallas kernel for Mamba-2 prefill/inference.

TPU-native counterpart of mamba_ssm's Triton ``ssd_combined`` pipeline
(SURVEY §2.3 row 1) — but fused into ONE kernel: the grid walks (head-tile,
chunk) with the running per-head (P, N) SSM states held in VMEM scratch, so
decay matrices and chunk states never round-trip through HBM (the pure-XLA
path in ``ssd_chunked.py`` materializes the (B, C, H, Q, Q) decay tensor —
and its XLA compile takes minutes at long L, vs seconds here).

Heads are processed ``head_tile`` at a time per grid step; the C·Bᵀ scores
matmul is computed once per tile (shared across a group's heads at
ngroups=1 — the reference always runs ngroups=1) and the per-head math is an
unrolled loop of pure 2-D ops (Mosaic-friendly: no lane<->sublane
relayouts; dt is passed in both (Q,·) and (·,Q) layouts so the cumsum can
be built as row and column vectors without transposes):

    s_col = tril @ (dt_col * A)              # cumsum as one matmul
    s_row = (dt_row * A) @ tril^T
    y     = (scores * tril(e^{s_col - s_row})) @ (dt*x)
          + e^{s_col} * (C @ state^T) + D * x
    state = e^{total} * state + ((dt*x) * e^{total-s_col})^T-free dot @ B

Numerics match ``ssd_chunked``: fp32 exponentials/cumsum/state, fp32 matmul
accumulation. Forward-only (training uses the differentiable XLA path).
Runs in interpret mode on non-TPU backends so CPU tests cover it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def effective_chunk(chunk_size: int, interpret: bool) -> int:
    """Compiled TPU kernels need the (Hb, Q) dt block's lane dim %128; small
    model configs (tests, tiny) may set chunk < 128 — round up (chunking is
    math-invariant)."""
    return chunk_size if interpret else max(chunk_size, 128)


def _ssd_kernel(
    # scalar prefetch
    A_ref,  # (B*H,) fp32
    D_ref,  # (B*H,) fp32
    # blocks
    x_ref,  # (1, Hb, Q, P)
    dtc_ref,  # (1, Q, Hb)  column layout
    dtr_ref,  # (1, Hb, Q)  row layout
    B_ref,  # (1, Q, N)
    C_ref,  # (1, Q, N)
    y_ref,  # (1, Hb, Q, P) out
    state_out_ref,  # (1, Hb, P, N) out
    state_ref,  # (Hb, P, N) fp32 VMEM scratch
    *,
    chunk: int,
    hb: int,
    heads_per_batch: int,
    tiles_per_batch: int,
):
    bt = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    Q = chunk
    dtc = dtc_ref[0].astype(jnp.float32)  # (Q, Hb)
    dtr = dtr_ref[0].astype(jnp.float32)  # (Hb, Q)
    Bm = B_ref[0].astype(jnp.float32)  # (Q, N)
    Cm = C_ref[0].astype(jnp.float32)  # (Q, N)

    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    mask = col <= row
    tril = mask.astype(jnp.float32)

    # scores shared by every head in the tile (single group at ngroups=1)
    scores = jnp.dot(Cm, Bm.T, preferred_element_type=jnp.float32)  # (Q, Q)

    b = bt // tiles_per_batch
    head0 = (bt % tiles_per_batch) * hb

    for h in range(hb):
        gh = b * heads_per_batch + head0 + h
        A = A_ref[gh]
        D = D_ref[gh]

        x = x_ref[0, h].astype(jnp.float32)  # (Q, P)
        a_col = dtc[:, h : h + 1] * A  # (Q, 1)
        a_row = dtr[h : h + 1, :] * A  # (1, Q)
        s_col = jnp.dot(tril, a_col, preferred_element_type=jnp.float32)  # (Q,1)
        s_row = jnp.dot(a_row, tril.T, preferred_element_type=jnp.float32)  # (1,Q)
        total = s_col[Q - 1, 0]

        decay = jnp.where(mask, jnp.exp(s_col - s_row), 0.0)  # (Q, Q)
        dtx = dtc[:, h : h + 1] * x  # (Q, P)
        y = jnp.dot(scores * decay, dtx, preferred_element_type=jnp.float32)

        state = state_ref[h]  # (P, N)
        y_inter = jax.lax.dot_general(
            Cm, state, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Q, P)
        y = y + jnp.exp(s_col) * y_inter + D * x
        y_ref[0, h] = y.astype(y_ref.dtype)

        carry = jnp.exp(total - s_col)  # (Q, 1)
        new_state = jnp.exp(total) * state + jax.lax.dot_general(
            dtx * carry, Bm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, N)
        state_ref[h] = new_state
        state_out_ref[0, h] = new_state.astype(state_out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "interpret", "head_tile")
)
def ssd_pallas(
    x: jax.Array,  # (B, L, H, P)
    dt: jax.Array,  # (B, L, H) softplus'ed
    A: jax.Array,  # (H,)
    Bmat: jax.Array,  # (B, L, G, N)
    Cmat: jax.Array,  # (B, L, G, N)
    D: Optional[jax.Array] = None,  # (H,)
    *,
    chunk_size: int = 256,
    head_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Same contract as ``ssd_chunked.ssd_chunked`` (zero initial state):
    returns (y (B,L,H,P) in x.dtype, final_state (B,H,P,N) fp32)."""
    Bsz, L, H, P = x.shape
    G, N = Bmat.shape[2], Bmat.shape[3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q = effective_chunk(chunk_size, interpret)
    pad = (-L) % Q
    Lp = L + pad
    C = Lp // Q
    rep = H // G
    if head_tile is None:
        # v5e sweep at 1.3B geometry: Hb=16 beats 8 by ~15% (fewer grid
        # steps; scores reuse amortized further)
        head_tile = min(16, rep)
    Hb = head_tile
    assert rep % Hb == 0, "head_tile must divide heads-per-group"
    HT = H // Hb  # tiles per batch; each tile lies inside one group

    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cmat = jnp.pad(Cmat, ((0, 0), (0, pad), (0, 0), (0, 0)))

    xf = x.transpose(0, 2, 1, 3).reshape(Bsz * HT, Hb, Lp, P)
    dt32 = dt.astype(jnp.float32)
    # both layouts so the kernel never transposes (Mosaic relayout limits)
    dtc = dt32.reshape(Bsz, Lp, HT, Hb).transpose(0, 2, 1, 3).reshape(Bsz * HT, Lp, Hb)
    dtr = dt32.transpose(0, 2, 1).reshape(Bsz * HT, Hb, Lp)
    Bf = Bmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)
    Cf = Cmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)

    A_all = jnp.tile(A.astype(jnp.float32), Bsz)
    D_all = (
        jnp.zeros((Bsz * H,), jnp.float32)
        if D is None
        else jnp.tile(D.astype(jnp.float32), Bsz)
    )

    tiles_per_group = rep // Hb

    def brow(bt):  # tile index -> (batch, group) row of B/C
        return (bt // HT) * G + (bt % HT) // tiles_per_group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bsz * HT, C),
        in_specs=[
            pl.BlockSpec((1, Hb, Q, P), lambda bt, c, A, D: (bt, 0, c, 0)),
            pl.BlockSpec((1, Q, Hb), lambda bt, c, A, D: (bt, c, 0)),
            pl.BlockSpec((1, Hb, Q), lambda bt, c, A, D: (bt, 0, c)),
            pl.BlockSpec((1, Q, N), lambda bt, c, A, D: (brow(bt), c, 0)),
            pl.BlockSpec((1, Q, N), lambda bt, c, A, D: (brow(bt), c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hb, Q, P), lambda bt, c, A, D: (bt, 0, c, 0)),
            pl.BlockSpec((1, Hb, P, N), lambda bt, c, A, D: (bt, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((Hb, P, N), jnp.float32)],
    )

    y, final_state = pl.pallas_call(
        functools.partial(
            _ssd_kernel,
            chunk=Q,
            hb=Hb,
            heads_per_batch=H,
            tiles_per_batch=HT,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bsz * HT, Hb, Lp, P), x.dtype),
            jax.ShapeDtypeStruct((Bsz * HT, Hb, P, N), jnp.float32),
        ],
        interpret=interpret,
    )(A_all, D_all, xf, dtc, dtr, Bf, Cf)

    y = y.reshape(Bsz, H, Lp, P).transpose(0, 2, 1, 3)[:, :L]
    final_state = final_state.reshape(Bsz, H, P, N)
    return y, final_state
