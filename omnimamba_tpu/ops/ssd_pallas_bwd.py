"""Backward Pallas kernel for the chunked SSD scan + custom-VJP wiring.

Makes the fused Pallas forward (``ssd_pallas.py``) usable in training: the
XLA-autodiff path materializes the per-chunk (Q, Q) decay/attention tensors
as residuals (O(B·H·L·Q) HBM — GBs at the stage-2 batch), whereas this
backward recomputes them chunk-by-chunk in VMEM — the flash-attention-style
trade applied to state-space duality. The chunk-ENTRY states it needs are
emitted by the forward kernel itself (``return_chunk_states=True``), where
they already live in VMEM scratch.

Derivation (per head; a_k = dt_k A, s = cumsum a, pairwise weight
w_tj = e^{s_t - s_j}[t>=j], scores_tj = C_t·B_j, h_in the state entering the
chunk, adj = Σ_{t>chunk} e^{s_t - s_end} g_t C_tᵀ (kept (P, N)) the adjoint
carried backward over chunks, Gx_tj = g_t·x_j):

    y_t  = Σ_j w_tj scores_tj dt_j x_j + e^{s_t} C_t h_inᵀ + D x_t

    dC_t = ((Gx ∘ w ∘ dt_row) B)_t + e^{s_t} (g_t h_in)
    dB_j = dt_j ((Gx ∘ w)ᵀ C)_j + dt_j e^{tot-s_j} (x_j · adj)
    K_j  = ((scores ∘ w)ᵀ g)_j + e^{tot-s_j} (adj B_jᵀ) ;  dx = dt∘K + D g
    da_k = suffix_t(r)_k + Σχ + v ;   r = Σ_n C∘dC − Σ_n B∘dB
             χ_j = e^{tot-s_j} dt_j (x_j · (adj Bᵀ)_j) = Σ_n B∘dB2_j
             v   = e^{tot} <h_in, adj>               [dL/d total]
    ddt  = A da + Σ_p x ∘ K ;  dA_h = Σ dt∘da ;  dD_h = Σ g·x

(da folds the decay cotangent into the already-computed dC/dB outputs:
dL/ds_t = Σ_j E_tj + φ_t = Σ_n C_tn dC_tn and dL/ds_j ∋ −colsum(E)−χ =
−Σ_n B_jn dB_jn, with E = scores∘Gx∘w∘dt_row. The naive corner-sum
da_k = Σ_{t≥k, j<k} E_tj is a (Q,Q)@(Q,Q) matmul — one third of the
backward FLOPs; here it costs two (Q,N) row-reductions and one masked
(Q,Q)@(Q,1) suffix matvec, and E never materializes.)

TPU mapping mirrors the forward kernel: per-head tensors are transposed —
time on the 128-wide lane dim, headdim P=64 on sublanes — and every large
dot takes ``mxu_dtype`` operands (bf16 native on the MXU; fp32 operands
cost 3-6x emulation passes) with fp32 accumulation. The grid walks
(batch, reverse-chunk, head-tile) with the head-tile INNERMOST so dB/dC
accumulate across a group's tiles directly in the VMEM output block — no
per-tile partials round-tripping through HBM. The per-(batch, head) adjoint
states live in one (HT, Hb, P, N) fp32 scratch indexed by the tile id.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omnimamba_tpu.ops.ssd_pallas import effective_chunk, ssd_pallas


def _ssd_bwd_kernel(
    # scalar prefetch
    A_ref,  # (B*H,)
    # blocks (transposed per-head layout: time on the LANE dim)
    x_ref,  # (1, Hb, P, Q)
    g_ref,  # (1, Hb, P, Q) dL/dy
    dtr_ref,  # (1, Hb, Q)
    dtc_ref,  # (1, Q, Hb)
    B_ref,  # (1, Q, N)
    C_ref,  # (1, Q, N)
    scol_ref,  # (1, Q, Hb) within-chunk decay cumsum, column layout
    srow_ref,  # (1, Hb, Q) same, row layout
    hin_ref,  # (1, 1, Hb, P, N) chunk-entry states (fwd residual)
    gstate_ref,  # (1, Hb, P, N) final-state cotangent
    # outputs
    dx_ref,  # (1, Hb, P, Q)  (x-path only; D*g added on host)
    ddt_ref,  # (1, Q, Hb)
    dB_ref,  # (1, Q, N) accumulated across the group's tiles in VMEM
    dC_ref,  # (1, Q, N) accumulated likewise
    dA_ref,  # (1, 1, 1, Hb) per-(chunk, tile) partial
    dD_ref,  # (1, 1, 1, Hb)
    # scratch
    adj_ref,  # (HT, Hb, P, N) fp32 adjoint states, all tiles
    scores_ref,  # (Q, Q) fp32, shared across a group's tiles
    *,
    chunk: int,
    hb: int,
    heads_per_batch: int,
    tiles_per_batch: int,
    tiles_per_group: int,
    mxu_dtype,
    precision,
):
    b = pl.program_id(0)
    cr = pl.program_id(1)  # walks chunks in REVERSE via the index maps
    t = pl.program_id(2)  # head tile, innermost
    first_in_group = t % tiles_per_group == 0

    @pl.when(cr == 0)
    def _():
        for h in range(hb):
            adj_ref[t, h] = gstate_ref[0, h].astype(jnp.float32)

    Q = chunk
    dtr = dtr_ref[0].astype(jnp.float32)  # (Hb, Q)
    dtc = dtc_ref[0].astype(jnp.float32)  # (Q, Hb)
    Bmx = B_ref[0].astype(mxu_dtype)  # (Q, N)
    Cmx = C_ref[0].astype(mxu_dtype)  # (Q, N)
    S_cols = scol_ref[0]  # (Q, Hb) fp32
    S_rows = srow_ref[0]  # (Hb, Q) fp32

    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)  # t (target)
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)  # j (source)
    maskb = row >= col  # [t >= j]
    mask = maskb.astype(jnp.float32)

    # Sub-tile decomposition of the causal (Q, Q) block (MXU-width tiles):
    # strictly-upper tiles are all-zero and DROP OUT of every dot (1/3 of
    # the per-head Q² FLOPs at Q=384), and each strictly-lower tile's decay
    # factors EXACTLY as e^{s_t - s_j} = e^{s_t - s_m} · e^{s_m - s_j} with
    # m the source tile's last row (both exponents <= 0 — no clamps), so
    # only the nt diagonal tiles pay the (T, T) exp. Falls back to the
    # monolithic path when Q isn't a multiple of 128.
    TT = 128
    nt = Q // TT if (Q % TT == 0 and Q >= 2 * TT) else 0
    if nt:
        trow = jax.lax.broadcasted_iota(jnp.int32, (TT, TT), 0)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (TT, TT), 1)
        maskb_t = trow >= tcol

    # scores_tj = C_t · B_j — shared across the group's tiles (ngroups=1 in
    # every shipped config), so compute once per (batch, chunk, group)
    @pl.when(first_in_group)
    def _():
        scores_ref[...] = jax.lax.dot_general(
            Cmx, Bmx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    scores = scores_ref[...]  # (Q, Q) fp32, (t, j)

    head0 = t * hb
    dB_acc = jnp.zeros((Q, Bmx.shape[1]), jnp.float32)
    dC_acc = jnp.zeros((Q, Cmx.shape[1]), jnp.float32)
    r_cols = []  # (Q, 1) per head: dL/ds decay-cotangent rows
    bias_vals = []  # scalar per head: Σχ + v
    A_vals = []
    ksum_cols = []  # (Q,) per head: Σ_p x ∘ K
    gx_cols = []  # (Q,) per head: Σ_p g ∘ x

    B32 = Bmx.astype(jnp.float32)
    C32 = Cmx.astype(jnp.float32)

    for h in range(hb):
        gh = b * heads_per_batch + head0 + h
        A = A_ref[gh]

        xT = x_ref[0, h]  # (P, Q) input dtype
        gT = g_ref[0, h]
        g_mx = gT.astype(mxu_dtype)
        xf = xT.astype(jnp.float32)
        gf = gT.astype(jnp.float32)
        h_in = hin_ref[0, 0, h]  # (P, N)
        h_mx = h_in.astype(mxu_dtype)
        adj = adj_ref[t, h]  # (P, N) fp32
        adj_mx = adj.astype(mxu_dtype)

        dt_row = dtr[h : h + 1, :]  # (1, Q)
        s_col = S_cols[:, h : h + 1]  # (Q, 1), s_t on sublanes
        s_row = S_rows[h : h + 1, :]  # (1, Q), s_j on lanes
        total = s_col[Q - 1, 0]

        es_row = jnp.exp(s_row)  # (1, Q)
        carry_row = jnp.exp(total - s_row)  # (1, Q), e^{tot - s_j}
        etot = jnp.exp(total)

        # dt/decay scalings folded into the SMALL (P, Q) operands once,
        # instead of (Q, Q)/(Q, N) products per use (the fp32 elementwise
        # Q x Q passes were the backward's VPU tax — VERDICT r3 item 2):
        #   xd = dt_j x_j        carries dt into Gx -> dC AND dB1
        #   ge = e^{s_t} g_t     carries the decay into dC's boundary term
        #                        AND the adjoint update (shared operand)
        #   xc = dt_j e^{tot-s_j} x_j   carries both factors of dB2
        xd_mx = (xf * dt_row).astype(mxu_dtype)
        ge_mx = (gf * es_row).astype(mxu_dtype)
        xc_mx = (xf * (dt_row * carry_row)).astype(mxu_dtype)

        P = gT.shape[0]
        Nn = Bmx.shape[1]
        f32 = jnp.float32
        dims_p = (((0,), (0,)), ((), ()))  # contract the P (sublane) dim
        dims_t = (((1,), (0,)), ((), ()))  # contract the t dim (lhs lanes)
        if nt:
            # tiled: lower-triangle (TT, TT) tiles only
            dC1_rows = []
            dB1_accs = [jnp.zeros((TT, Nn), f32) for _ in range(nt)]
            Kt_accs = [jnp.zeros((P, TT), f32) for _ in range(nt)]
            for it in range(nt):
                g_blk = g_mx[:, it * TT : (it + 1) * TT]  # (P, TT)
                C_blk = Cmx[it * TT : (it + 1) * TT]  # (TT, N)
                sc_blk = s_col[it * TT : (it + 1) * TT]  # (TT, 1)
                accC = jnp.zeros((TT, Nn), f32)
                for jt in range(it + 1):
                    xd_blk = xd_mx[:, jt * TT : (jt + 1) * TT]
                    B_blk = Bmx[jt * TT : (jt + 1) * TT]
                    sr_blk = s_row[:, jt * TT : (jt + 1) * TT]  # (1, TT)
                    St = scores[it * TT : (it + 1) * TT, jt * TT : (jt + 1) * TT]
                    Gt = jax.lax.dot_general(
                        g_blk, xd_blk, dims_p, preferred_element_type=f32, precision=precision
                    )  # (TT, TT): g_t · dt_j x_j
                    if it == jt:
                        wt = jnp.exp(
                            jnp.where(maskb_t, sc_blk - sr_blk, -jnp.inf)
                        )
                    else:
                        sm = s_col[jt * TT + TT - 1, 0]  # source tile end
                        wt = jnp.exp(sc_blk - sm) * jnp.exp(sm - sr_blk)
                    gw = (Gt * wt).astype(mxu_dtype)
                    sw = (St * wt).astype(mxu_dtype)
                    accC = accC + jax.lax.dot_general(
                        gw, B_blk, dims_t, preferred_element_type=f32, precision=precision
                    )
                    dB1_accs[jt] = dB1_accs[jt] + jax.lax.dot_general(
                        gw, C_blk, dims_p, preferred_element_type=f32, precision=precision
                    )
                    Kt_accs[jt] = Kt_accs[jt] + jax.lax.dot_general(
                        g_blk, sw, dims_t, preferred_element_type=f32, precision=precision
                    )
                dC1_rows.append(accC)
            dC1 = jnp.concatenate(dC1_rows, axis=0)  # (Q, N)
            dB1d = jnp.concatenate(dB1_accs, axis=0)  # (Q, N)
            Kt1 = jnp.concatenate(Kt_accs, axis=1)  # (P, Q)
        else:
            # monolithic fallback: mask fused into the exp argument (s is a
            # cumsum of non-positives, so diff <= 0 holds exactly in fp for
            # t >= j; the select only guards MASKED entries)
            w = jnp.exp(jnp.where(maskb, s_col - s_row, -jnp.inf))
            Gxd = jax.lax.dot_general(  # Gxd_tj = g_t · x_j dt_j
                g_mx, xd_mx, dims_p, preferred_element_type=f32, precision=precision
            )  # (Q, Q)
            Gxdw = (Gxd * w).astype(mxu_dtype)
            SW = (scores * w).astype(mxu_dtype)
            dC1 = jax.lax.dot_general(  # (Gxd ∘ w) @ B
                Gxdw, Bmx, dims_t, preferred_element_type=f32, precision=precision
            )
            dB1d = jax.lax.dot_general(  # (Gxd ∘ w)ᵀ @ C, contract t —
                Gxdw, Cmx, dims_p, preferred_element_type=f32, precision=precision
            )  # the dt_col scale rides xd
            Kt1 = jax.lax.dot_general(  # K_j = Σ_t SW_tj g_t
                g_mx, SW, dims_t, preferred_element_type=f32, precision=precision
            )  # (P, Q)

        # --- dC ---------------------------------------------------------
        dC_h = dC1 + jax.lax.dot_general(  # e^{s_t} g_t h_in
            ge_mx, h_mx, dims_p, preferred_element_type=f32, precision=precision
        )
        dC_acc = dC_acc + dC_h

        # --- dB ---------------------------------------------------------
        dB2 = jax.lax.dot_general(  # dt_j e^{tot-s_j} (x_j · adj)
            xc_mx, adj_mx, dims_p, preferred_element_type=f32, precision=precision
        )
        dB_h = dB1d + dB2
        dB_acc = dB_acc + dB_h

        # --- K, dx ------------------------------------------------------
        Wt = jax.lax.dot_general(  # Wt_pj = (adj B_jᵀ)_p
            adj_mx, Bmx, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=precision,
        )  # (P, Q)
        Kt = Kt1 + carry_row * Wt
        dx_ref[0, h] = (dt_row * Kt).astype(dx_ref.dtype)

        # --- da: decay cotangent folded into dC/dB (see module docstring)
        # The suffix sum Σ_{t≥k} r_t is deferred: a per-head fp32 ones-
        # matvec on the MXU costs ~6 emulation passes at 1/128 lane use —
        # batching all Hb heads into ONE mask@(Q,Hb) dot after the loop is
        # ~Hb x cheaper. P-contractions are VPU sublane reductions, not dots.
        chi = jnp.sum(B32 * dB2, axis=1, keepdims=True)  # (Q, 1)
        r = jnp.sum(C32 * dC_h, axis=1, keepdims=True) - jnp.sum(
            B32 * dB_h, axis=1, keepdims=True
        )
        v = etot * jnp.sum(h_in.astype(jnp.float32) * adj)
        r_cols.append(r)
        bias_vals.append(jnp.sum(chi) + v)
        A_vals.append(A)

        # --- ddt ----------------------------------------------------------
        ksum_cols.append(jnp.sum(xf * Kt, axis=0))
        gx_cols.append(jnp.sum(gf * xf, axis=0))

        # --- adjoint carry to the earlier chunk ---------------------------
        adj_ref[t, h] = etot * adj + jax.lax.dot_general(
            ge_mx, Cmx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (P, N): Σ_t g_t e^{s_t} C_t — e^{s} rides the shared ge operand

    # batched suffix: da_kh = Σ_{t≥k} r_th — one (Q,Q)@(Q,Hb) dot for the
    # whole tile instead of Hb ones-matvecs. fp32 MXU operands cost 3-6
    # emulation passes, so on the bf16 path r splits into hi/lo bf16
    # components (two native dots, fp32-exact to ~2^-16 relative: the mask
    # operand is exactly representable and accumulation stays fp32).
    r_all = jnp.concatenate(r_cols, axis=1)  # (Q, Hb)
    if mxu_dtype == jnp.bfloat16:
        r_hi = r_all.astype(jnp.bfloat16)
        r_lo = (r_all - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mask_b = mask.astype(jnp.bfloat16)
        dims = (((0,), (0,)), ((), ()))  # contract t, mask_tk = [t >= k]
        suffix = jax.lax.dot_general(
            mask_b, r_hi, dims, preferred_element_type=jnp.float32, precision=precision
        ) + jax.lax.dot_general(
            mask_b, r_lo, dims, preferred_element_type=jnp.float32, precision=precision
        )
    else:
        suffix = jax.lax.dot_general(
            mask, r_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (Q, Hb)
    da_all = suffix + jnp.stack(bias_vals).reshape(1, hb)  # (Q, Hb)
    A_row = jnp.stack(A_vals).reshape(1, hb)
    ddt_all = A_row * da_all + jnp.stack(ksum_cols, axis=1)  # (Q, Hb)
    ddt_ref[0] = ddt_all.astype(ddt_ref.dtype)

    @pl.when(first_in_group)
    def _():
        dB_ref[0] = dB_acc.astype(dB_ref.dtype)
        dC_ref[0] = dC_acc.astype(dC_ref.dtype)

    @pl.when(jnp.logical_not(first_in_group))
    def _():
        dB_ref[0] = dB_ref[0] + dB_acc.astype(dB_ref.dtype)
        dC_ref[0] = dC_ref[0] + dC_acc.astype(dC_ref.dtype)

    dA_ref[0, 0, 0] = jnp.sum(dtc * da_all, axis=0).astype(dA_ref.dtype)
    dD_ref[0, 0, 0] = jnp.sum(
        jnp.stack(gx_cols, axis=1), axis=0
    ).astype(dD_ref.dtype)


def _bwd_impl(
    x, dt, A, Bmat, Cmat, hin, gy, gstate, *, chunk_size, head_tile, interpret
):
    """hin: canonical (B, C, H, P, N) fp32 chunk-entry states."""
    Bsz, L, H, P = x.shape
    G, N = Bmat.shape[2], Bmat.shape[3]
    Q = chunk_size
    pad = (-L) % Q
    Lp = L + pad
    C = Lp // Q
    rep = H // G
    Hb = head_tile
    HT = H // Hb
    tiles_per_group = rep // Hb

    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cmat = jnp.pad(Cmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
        gy = jnp.pad(gy, ((0, 0), (0, pad), (0, 0), (0, 0)))

    # transposed per-head layout (time on lanes), as in the forward
    xf = x.transpose(0, 2, 3, 1).reshape(Bsz * HT, Hb, P, Lp)
    gf = gy.astype(x.dtype).transpose(0, 2, 3, 1).reshape(Bsz * HT, Hb, P, Lp)
    dt32 = dt.astype(jnp.float32)
    dtr = dt32.transpose(0, 2, 1).reshape(Bsz * HT, Hb, Lp)
    dtc = dt32.reshape(Bsz, Lp, HT, Hb).transpose(0, 2, 1, 3).reshape(Bsz * HT, Lp, Hb)
    Bf = Bmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)
    Cf = Cmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)
    A_all = jnp.tile(A.astype(jnp.float32), Bsz)

    # decay cumsums in both layouts (XLA-side, as in the forward kernel)
    a = dt32 * A.astype(jnp.float32)[None, None, :]  # (B, Lp, H)
    s = jnp.cumsum(a.reshape(Bsz, C, Q, H), axis=2).reshape(Bsz, Lp, H)
    scol = s.reshape(Bsz, Lp, HT, Hb).transpose(0, 2, 1, 3).reshape(Bsz * HT, Lp, Hb)
    srow = s.transpose(0, 2, 1).reshape(Bsz * HT, Hb, Lp)

    hinf = (
        hin.transpose(0, 2, 1, 3, 4)  # (B, H, C, P, N)
        .reshape(Bsz * HT, Hb, C, P, N)
        .transpose(0, 2, 1, 3, 4)
        .reshape(Bsz * HT, C, Hb, P, N)
    )
    gstatef = gstate.astype(jnp.float32).reshape(Bsz * HT, Hb, P, N)

    def rc(cr):
        return C - 1 - cr

    def brow(b, t):  # (batch, tile) -> (batch, group) row of B/C/dB/dC
        return b * G + t // tiles_per_group

    mxu_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bsz, C, HT),
        in_specs=[
            pl.BlockSpec((1, Hb, P, Q), lambda b, cr, t, A: (b * (H // Hb) + t, 0, 0, rc(cr))),
            pl.BlockSpec((1, Hb, P, Q), lambda b, cr, t, A: (b * (H // Hb) + t, 0, 0, rc(cr))),
            pl.BlockSpec((1, Hb, Q), lambda b, cr, t, A: (b * (H // Hb) + t, 0, rc(cr))),
            pl.BlockSpec((1, Q, Hb), lambda b, cr, t, A: (b * (H // Hb) + t, rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda b, cr, t, A: (brow(b, t), rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda b, cr, t, A: (brow(b, t), rc(cr), 0)),
            pl.BlockSpec((1, Q, Hb), lambda b, cr, t, A: (b * (H // Hb) + t, rc(cr), 0)),
            pl.BlockSpec((1, Hb, Q), lambda b, cr, t, A: (b * (H // Hb) + t, 0, rc(cr))),
            pl.BlockSpec((1, 1, Hb, P, N), lambda b, cr, t, A: (b * (H // Hb) + t, rc(cr), 0, 0, 0)),
            pl.BlockSpec((1, Hb, P, N), lambda b, cr, t, A: (b * (H // Hb) + t, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hb, P, Q), lambda b, cr, t, A: (b * (H // Hb) + t, 0, 0, rc(cr))),
            pl.BlockSpec((1, Q, Hb), lambda b, cr, t, A: (b * (H // Hb) + t, rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda b, cr, t, A: (brow(b, t), rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda b, cr, t, A: (brow(b, t), rc(cr), 0)),
            pl.BlockSpec((1, 1, 1, Hb), lambda b, cr, t, A: (b * (H // Hb) + t, rc(cr), 0, 0)),
            pl.BlockSpec((1, 1, 1, Hb), lambda b, cr, t, A: (b * (H // Hb) + t, rc(cr), 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((HT, Hb, P, N), jnp.float32),
            pltpu.VMEM((Q, Q), jnp.float32),
        ],
    )

    dx_t, ddt_t, dB_t, dC_t, dA_t, dD_t = pl.pallas_call(
        functools.partial(
            _ssd_bwd_kernel,
            chunk=Q,
            hb=Hb,
            heads_per_batch=H,
            tiles_per_batch=HT,
            tiles_per_group=tiles_per_group,
            mxu_dtype=mxu_dtype,
            precision=(
                jax.lax.Precision.HIGHEST
                if mxu_dtype == jnp.float32
                else None
            ),
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bsz * HT, Hb, P, Lp), x.dtype),
            jax.ShapeDtypeStruct((Bsz * HT, Lp, Hb), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * G, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * G, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, C, 1, Hb), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, C, 1, Hb), jnp.float32),
        ],
        interpret=interpret,
        # v5e VMEM is 128M; the compiler's 16M scoped default blocks
        # head_tile=16 by a hair
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(A_all, xf, gf, dtr, dtc, Bf, Cf, scol, srow, hinf, gstatef)

    dx = dx_t.reshape(Bsz, H, P, Lp).transpose(0, 3, 1, 2)[:, :L]
    ddt = (
        ddt_t.reshape(Bsz, HT, Lp, Hb).transpose(0, 2, 1, 3).reshape(Bsz, Lp, H)[:, :L]
    )
    dBg = dB_t.reshape(Bsz, G, Lp, N).transpose(0, 2, 1, 3)[:, :L]
    dCg = dC_t.reshape(Bsz, G, Lp, N).transpose(0, 2, 1, 3)[:, :L]
    dA = dA_t.reshape(Bsz, HT, C, Hb).sum(axis=(0, 2)).reshape(H)
    dD_head = dD_t.reshape(Bsz, HT, C, Hb).sum(axis=(0, 2)).reshape(H)
    return dx, ddt, dA, dBg, dCg, dD_head


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def ssd_pallas_ad(
    x, dt, A, Bmat, Cmat, D, chunk_size=256, head_tile=None, interpret=None
):
    """Differentiable fused SSD: Pallas forward + Pallas backward.

    Same contract as ``ssd_chunked`` (returns (y, final_state)); training
    selects it via ``scan_impl='pallas_ad'``. ``D=None`` is supported.
    ``head_tile`` sets the BACKWARD kernel's tile (the forward picks its
    own default); both tilings meet at the canonical chunk-states layout.
    """
    return ssd_pallas(
        x, dt, A, Bmat, Cmat, D,
        chunk_size=chunk_size, head_tile=None, interpret=interpret,
    )


def _fwd(x, dt, A, Bmat, Cmat, D, chunk_size, head_tile, interpret):
    y, state, hin = ssd_pallas(
        x, dt, A, Bmat, Cmat, D,
        chunk_size=chunk_size, head_tile=None, interpret=interpret,
        return_chunk_states=True,
    )
    # named residuals: under remat="proj_ssd" (train.trainer) the policy
    # pins these, so the rematerialized backward reuses the saved chunk
    # states + kernel inputs instead of re-running the Pallas forward and
    # the conv/dt-activation chain that feeds it
    from jax.ad_checkpoint import checkpoint_name

    hin = checkpoint_name(hin, "ssd_resid")
    x_r = checkpoint_name(x, "ssd_in")
    dt_r = checkpoint_name(dt, "ssd_in")
    B_r = checkpoint_name(Bmat, "ssd_in")
    C_r = checkpoint_name(Cmat, "ssd_in")
    return (y, state), (x_r, dt_r, A, B_r, C_r, D, hin)


def _bwd(chunk_size, head_tile, interpret, res, cts):
    x, dt, A, Bmat, Cmat, D, hin = res
    gy, gstate = cts
    Bsz, L, H, P = x.shape
    G = Bmat.shape[2]
    rep = H // G
    # Large tiles amortize the shared score matmuls and the batched
    # suffix-sum dot over more heads per grid step: on v5e at the 1.3B
    # shape (H=64, P=64, N=128) ht=64 measures 1.25-1.20 ms bwd-only vs
    # 2.00 ms for ht=16, at every chunk size swept (scripts/profile_train.py
    # ssd). The tile must divide rep: pick the largest divisor <= 64.
    if head_tile is not None:
        # A tile that spans a B/C group boundary would read one group's
        # B/C block for all its heads (silent wrong grads when G>1), and a
        # non-dividing tile crashes the layout reshapes — reject both.
        if rep % head_tile != 0:
            raise ValueError(
                f"head_tile={head_tile} must divide heads-per-group "
                f"(H={H} / G={G} = {rep})"
            )
        ht = head_tile
    else:
        ht = next(d for d in (64, 32, 16, 8, 4, 2, 1) if rep % d == 0)
    interp = interpret if interpret is not None else jax.default_backend() != "tpu"
    Q = effective_chunk(chunk_size, interp)

    dx, ddt, dA, dB, dC, dD_head = _bwd_impl(
        x, dt, A, Bmat, Cmat, hin, gy, gstate,
        chunk_size=Q, head_tile=ht, interpret=interp,
    )
    if D is not None:
        dx = dx + gy.astype(jnp.float32) * D.astype(jnp.float32)[None, None, :, None]
        dD = dD_head.astype(D.dtype)
    else:
        dD = None
    return (
        dx.astype(x.dtype),
        ddt.astype(dt.dtype),
        dA.astype(A.dtype),
        dB.astype(Bmat.dtype),
        dC.astype(Cmat.dtype),
        dD,
    )


ssd_pallas_ad.defvjp(_fwd, _bwd)
