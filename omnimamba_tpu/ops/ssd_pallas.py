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
    D_ref,  # (B*H,) fp32
    # blocks (note TRANSPOSED per-head layout: time on the LANE dim)
    x_ref,  # (1, Hb, P, Q)
    dtr_ref,  # (1, Hb, Q)
    B_ref,  # (1, Q, N)
    C_ref,  # (1, Q, N)
    scol_ref,  # (1, Q, Hb) within-chunk decay cumsum, column layout
    srow_ref,  # (1, Hb, Q) same, row layout
    y_ref,  # (1, Hb, P, Q) out
    state_out_ref,  # (1, Hb, P, N) out
    *rest,  # [hin_ref (1, 1, Hb, P, N) out]? + state_ref (Hb, P, N) scratch
    chunk: int,
    hb: int,
    heads_per_batch: int,
    tiles_per_batch: int,
    mxu_dtype,
    precision,
    emit_chunk_states: bool,
):
    if emit_chunk_states:
        hin_ref, state_ref = rest
    else:
        (state_ref,) = rest
    """Per-(head-tile, chunk) body, transposed formulation.

    TPU vector lanes are 128-wide; headdim P=64 would half-pad every load,
    VPU op, and MXU N-dim. So per-head tensors are laid out (P, Q) — time
    on the lanes — making every dot full-width:

        yT_h (P,Q)   = dtxT_h (P,Q) @ WT (Q,Q)        WT_jt = scores_tj decay_tj
        y_interT (P,Q) = state (P,N) @ CmxT            (contract N)
        state' (P,N) = e^tot state + dtxcT (P,Q) @ Bmx (Q,N)

    Every *large* dot takes ``mxu_dtype`` operands (bf16 natively on the
    MXU; fp32 operands cost 3-6x emulation passes) with fp32 accumulation.
    The decay cumsums ``s = cumsum(dt*A)`` arrive precomputed from XLA in
    both layouts (tiny (L, H) arrays; in-kernel transposes are Mosaic
    relayouts and in-kernel cumsum matmuls were pure overhead). The causal
    mask folds into the shared scores once; per-head decay uses a clamped
    exp (masked entries have positive exponent -> clamp to exp(0)=1 times a
    zeroed score).
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    Q = chunk
    dtr = dtr_ref[0].astype(jnp.float32)  # (Hb, Q)
    Bmx = B_ref[0].astype(mxu_dtype)  # (Q, N)
    Cmx = C_ref[0].astype(mxu_dtype)  # (Q, N)
    S_cols = scol_ref[0]  # (Q, Hb) fp32
    S_rows = srow_ref[0]  # (Hb, Q) fp32

    # Sub-tile decomposition (see ssd_pallas_bwd for the derivation): with
    # 128-wide tiles the strictly-lower (j > t) tiles drop out of the yT
    # dot entirely and strictly-upper tiles factor their decay exactly at
    # the source tile's boundary — only diagonal tiles pay the (T, T) exp.
    TT = 128
    nt = Q // TT if (Q % TT == 0 and Q >= 2 * TT) else 0

    # scoresT_jt = C_t . B_j, shared across the tile's heads (ngroups=1)
    scoresT = jax.lax.dot_general(
        Bmx, Cmx, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Q, Q) indexed (j, t)
    if nt:
        trow = jax.lax.broadcasted_iota(jnp.int32, (TT, TT), 0)  # j
        tcol = jax.lax.broadcasted_iota(jnp.int32, (TT, TT), 1)  # t
        maskb_t = tcol >= trow
    else:
        # (Q, Q) causal mask + full-matrix masked scores: only the
        # monolithic small-Q path consumes these
        row = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)  # j (source)
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)  # t (target)
        causal = (col >= row).astype(jnp.float32)  # [t >= j]
        masked_scoresT = (scoresT * causal).astype(mxu_dtype)

    bt = pl.program_id(0)
    b = bt // tiles_per_batch
    head0 = (bt % tiles_per_batch) * hb

    xf = x_ref[0].astype(jnp.float32)  # (Hb, P, Q)
    dtx_all = xf * dtr[:, None, :]  # (Hb, P, Q) fp32

    for h in range(hb):
        gh = b * heads_per_batch + head0 + h
        D = D_ref[gh]

        if emit_chunk_states:
            # chunk-ENTRY state: the custom-VJP backward's residual
            # (saved here for free instead of an XLA recompute pass)
            hin_ref[0, 0, h] = state_ref[h].astype(hin_ref.dtype)

        s_j = S_cols[:, h : h + 1]  # (Q, 1) source decay cumsum
        s_t = S_rows[h : h + 1, :]  # (1, Q) target decay cumsum
        total = s_j[Q - 1, 0]

        if nt:
            dtx_mx = dtx_all[h].astype(mxu_dtype)  # (P, Q)
            y_cols = []
            for tt in range(nt):  # target tile
                st_blk = s_t[:, tt * TT : (tt + 1) * TT]  # (1, TT)
                acc = jnp.zeros((dtx_mx.shape[0], TT), jnp.float32)
                for jt in range(tt + 1):  # source tile (j <= t)
                    sj_blk = s_j[jt * TT : (jt + 1) * TT]  # (TT, 1)
                    St = scoresT[jt * TT : (jt + 1) * TT, tt * TT : (tt + 1) * TT]
                    if jt == tt:
                        wt = jnp.exp(jnp.where(maskb_t, st_blk - sj_blk, -jnp.inf))
                    else:
                        sm = s_j[jt * TT + TT - 1, 0]  # source tile end
                        wt = jnp.exp(sm - sj_blk) * jnp.exp(st_blk - sm)
                    acc = acc + jnp.dot(
                        dtx_mx[:, jt * TT : (jt + 1) * TT],
                        (St * wt).astype(mxu_dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                y_cols.append(acc)
            yT = jnp.concatenate(y_cols, axis=1)  # (P, Q)
        else:
            decayT = jnp.exp(jnp.minimum(s_t - s_j, 0.0))  # (Q, Q) (j, t)
            WT = masked_scoresT * decayT.astype(mxu_dtype)
            yT = jnp.dot(
                dtx_all[h].astype(mxu_dtype), WT,
                preferred_element_type=jnp.float32, precision=precision,
            )  # (P, Q)

        state = state_ref[h]  # (P, N) fp32
        y_interT = jax.lax.dot_general(
            state.astype(mxu_dtype),
            Cmx,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (P, Q)
        yT = yT + jnp.exp(s_t) * y_interT + D * xf[h]
        y_ref[0, h] = yT.astype(y_ref.dtype)

        carry = jnp.exp(total - s_t)  # (1, Q) source carry to chunk end
        new_state = jnp.exp(total) * state + jnp.dot(
            (dtx_all[h] * carry).astype(mxu_dtype),
            Bmx,
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (P, N)
        state_ref[h] = new_state
        state_out_ref[0, h] = new_state.astype(state_out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("chunk_size", "interpret", "head_tile", "return_chunk_states"),
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
    return_chunk_states: bool = False,
) -> Tuple[jax.Array, ...]:
    """Same contract as ``ssd_chunked.ssd_chunked`` (zero initial state):
    returns (y (B,L,H,P) in x.dtype, final_state (B,H,P,N) fp32).

    With ``return_chunk_states`` a third output is appended: the fp32
    chunk-ENTRY states, canonical layout (B, C, H, P, N) — the residual the
    Pallas backward consumes."""
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
        # steps; scores reuse amortized further). Largest divisor of rep
        # <= 16 so odd group geometries never auto-pick a spanning tile.
        head_tile = next(d for d in (16, 8, 4, 2, 1) if rep % d == 0)
    Hb = head_tile
    if rep % Hb != 0:
        raise ValueError(
            f"head_tile={Hb} must divide heads-per-group (H={H} / G={G} = {rep})"
        )
    HT = H // Hb  # tiles per batch; each tile lies inside one group

    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cmat = jnp.pad(Cmat, ((0, 0), (0, pad), (0, 0), (0, 0)))

    # transposed per-head layout: time on the lane dim (see kernel docstring)
    xf = x.transpose(0, 2, 3, 1).reshape(Bsz * HT, Hb, P, Lp)
    dt32 = dt.astype(jnp.float32)
    dtr = dt32.transpose(0, 2, 1).reshape(Bsz * HT, Hb, Lp)

    # within-chunk decay cumsum s = cumsum(dt * A) — tiny (L, H) arrays,
    # computed (and fused) by XLA; passed in BOTH layouts so the kernel
    # never transposes (Mosaic relayout limits)
    a = dt32 * A.astype(jnp.float32)[None, None, :]  # (B, Lp, H)
    s = jnp.cumsum(a.reshape(Bsz, C, Q, H), axis=2).reshape(Bsz, Lp, H)
    scol = s.reshape(Bsz, Lp, HT, Hb).transpose(0, 2, 1, 3).reshape(Bsz * HT, Lp, Hb)
    srow = s.transpose(0, 2, 1).reshape(Bsz * HT, Hb, Lp)

    Bf = Bmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)
    Cf = Cmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)

    D_all = (
        jnp.zeros((Bsz * H,), jnp.float32)
        if D is None
        else jnp.tile(D.astype(jnp.float32), Bsz)
    )

    tiles_per_group = rep // Hb

    def brow(bt):  # tile index -> (batch, group) row of B/C
        return (bt // HT) * G + (bt % HT) // tiles_per_group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bsz * HT, C),
        in_specs=[
            pl.BlockSpec((1, Hb, P, Q), lambda bt, c, D: (bt, 0, 0, c)),
            pl.BlockSpec((1, Hb, Q), lambda bt, c, D: (bt, 0, c)),
            pl.BlockSpec((1, Q, N), lambda bt, c, D: (brow(bt), c, 0)),
            pl.BlockSpec((1, Q, N), lambda bt, c, D: (brow(bt), c, 0)),
            pl.BlockSpec((1, Q, Hb), lambda bt, c, D: (bt, c, 0)),
            pl.BlockSpec((1, Hb, Q), lambda bt, c, D: (bt, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hb, P, Q), lambda bt, c, D: (bt, 0, 0, c)),
            pl.BlockSpec((1, Hb, P, N), lambda bt, c, D: (bt, 0, 0, 0)),
        ]
        + (
            [pl.BlockSpec((1, 1, Hb, P, N), lambda bt, c, D: (bt, c, 0, 0, 0))]
            if return_chunk_states
            else []
        ),
        scratch_shapes=[pltpu.VMEM((Hb, P, N), jnp.float32)],
    )

    # bf16 activations take the native-MXU path (fp32 accumulation). fp32
    # inputs are the fidelity/oracle path: without an explicit precision the
    # MXU truncates fp32 dot operands to bf16 (measured 4e-3 rel err on TPU,
    # amplified to 8e-2 on dA through the folded decay-cotangent
    # cancellation — scripts/tpu_smoke.py), so request the multi-pass
    # fp32-exact lowering there; bf16 training keeps the fast default.
    mxu_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    precision = (
        jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32 else None
    )

    outs = pl.pallas_call(
        functools.partial(
            _ssd_kernel,
            chunk=Q,
            hb=Hb,
            heads_per_batch=H,
            tiles_per_batch=HT,
            mxu_dtype=mxu_dtype,
            precision=precision,
            emit_chunk_states=return_chunk_states,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bsz * HT, Hb, P, Lp), x.dtype),
            jax.ShapeDtypeStruct((Bsz * HT, Hb, P, N), jnp.float32),
        ]
        + (
            # residual states in x.dtype: the backward's dots cast them to
            # the MXU dtype anyway, and it halves the residual's HBM cost
            [jax.ShapeDtypeStruct((Bsz * HT, C, Hb, P, N), x.dtype)]
            if return_chunk_states
            else []
        ),
        interpret=interpret,
    )(D_all, xf, dtr, Bf, Cf, scol, srow)

    y = outs[0].reshape(Bsz, H, P, Lp).transpose(0, 3, 1, 2)[:, :L]
    final_state = outs[1].reshape(Bsz, H, P, N)
    if return_chunk_states:
        hin = (
            outs[2]
            .reshape(Bsz, HT, C, Hb, P, N)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(Bsz, C, H, P, N)
        )
        return y, final_state, hin
    return y, final_state
