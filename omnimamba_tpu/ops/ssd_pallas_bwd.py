"""Backward Pallas kernel for the chunked SSD scan + custom-VJP wiring.

Makes the fused Pallas forward (``ssd_pallas.py``) usable in training: the
XLA-autodiff path materializes the per-chunk (Q, Q) decay/attention tensors
as residuals (O(B·H·L·Q) HBM — GBs at the stage-2 batch), whereas this
backward recomputes them chunk-by-chunk in VMEM from O(B·H·C·P·N)
chunk-entry states — the flash-attention-style trade applied to state-space
duality.

Derivation (per head; a_k = dt_k A, s = cumsum a, pairwise weight
w_tj = e^{s_t - s_j}[t>=j], scores_tj = C_t·B_j, u_j = dt_j x_j, h_in the
state entering the chunk, adj = Σ_{t>chunk} e^{s_t - s_end} C_t g_tᵀ the
adjoint carried backward over chunks, Gx = g xᵀ):

    y_t  = Σ_j w_tj scores_tj u_j + e^{s_t} C_t h_in + D x_t

    dC_t = ((Gx ∘ w ∘ dt_row) B)_t + e^{s_t} (g_t h_in)
    dB_j = dt_j ((Gx ∘ w)ᵀ C)_j + dt_j e^{tot-s_j} (x_j adjᵀ)
    K_j  = ((scores ∘ w)ᵀ g)_j + e^{tot-s_j} (B adj)_j ;  dx = dt∘K + D g
    E    = scores ∘ Gx ∘ w ∘ dt_row
    da_k = 1ᵀ((E SU) ∘ tril) + trilᵀ φ + SUᵀ χ + v          (four pair classes)
             φ_t = e^{s_t} (g_t · (C h_inᵀ)_t)
             χ_j = e^{tot-s_j} dt_j (x_j · (B adj)_j)
             v   = e^{tot} <h_in, adjᵀ>
    ddt  = A da + Σ_p x ∘ K ;  dA_h = Σ dt∘da ;  dD_h = Σ g·x

The adjoint runs in VMEM scratch over reverse-ordered chunks (index maps
walk c = C-1-cr); the final-state cotangent seeds it (host-transposed to
(N, P)). dB/dC are per-tile partials reduced over a group's tiles on the
host; dA/dD are per-(tile, chunk) partials likewise.
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
    # blocks
    x_ref,  # (1, Hb, Q, P)
    dtc_ref,  # (1, Q, Hb)
    g_ref,  # (1, Hb, Q, P) dL/dy
    B_ref,  # (1, Q, N)
    C_ref,  # (1, Q, N)
    hin_ref,  # (1, 1, Hb, P, N) chunk-entry states
    gstate_ref,  # (1, Hb, N, P) final-state cotangent, pre-transposed
    # outputs
    dx_ref,  # (1, Hb, Q, P)  (x-path only; D*g added on host)
    ddt_ref,  # (1, Q, Hb)
    dB_ref,  # (1, Q, N) per-tile partial
    dC_ref,  # (1, Q, N) per-tile partial
    dA_ref,  # (1, 1, 1, Hb) per-(tile, chunk) partial
    dD_ref,  # (1, 1, 1, Hb)
    # scratch
    adj_ref,  # (Hb, N, P) fp32 adjoint state
    *,
    chunk: int,
    hb: int,
    heads_per_batch: int,
    tiles_per_batch: int,
):
    cr = pl.program_id(1)  # walks chunks in REVERSE via the index maps
    bt = pl.program_id(0)

    @pl.when(cr == 0)
    def _():
        for h in range(hb):
            adj_ref[h] = gstate_ref[0, h].astype(jnp.float32)

    Q = chunk
    dtc = dtc_ref[0].astype(jnp.float32)  # (Q, Hb)
    Bm = B_ref[0].astype(jnp.float32)  # (Q, N)
    Cm = C_ref[0].astype(jnp.float32)  # (Q, N)

    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)  # t
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)  # j / k
    mask = col <= row
    tril = mask.astype(jnp.float32)  # [j <= t]
    strict_upper = (col > row).astype(jnp.float32)  # SU_{jk} = [j < k]

    scores = jnp.dot(Cm, Bm.T, preferred_element_type=jnp.float32)  # (Q,Q)

    b = bt // tiles_per_batch
    head0 = (bt % tiles_per_batch) * hb

    dB_acc = jnp.zeros((Q, Bm.shape[1]), jnp.float32)
    dC_acc = jnp.zeros((Q, Cm.shape[1]), jnp.float32)
    ddt_cols = []
    da_cols = []
    gx_cols = []

    for h in range(hb):
        gh = b * heads_per_batch + head0 + h
        A = A_ref[gh]

        x = x_ref[0, h].astype(jnp.float32)  # (Q, P)
        g = g_ref[0, h].astype(jnp.float32)  # (Q, P)
        h_in = hin_ref[0, 0, h].astype(jnp.float32)  # (P, N)
        adj = adj_ref[h]  # (N, P)

        dt_col = dtc[:, h : h + 1]  # (Q, 1)
        a_col = dt_col * A
        s_col = jnp.dot(tril, a_col, preferred_element_type=jnp.float32)  # (Q,1)
        s_row = jnp.dot(
            a_col.reshape(1, Q), tril.T, preferred_element_type=jnp.float32
        )  # (1, Q)
        total = s_col[Q - 1, 0]

        w = jnp.where(mask, jnp.exp(s_col - s_row), 0.0)  # (Q,Q)
        Gx = jnp.dot(g, x.T, preferred_element_type=jnp.float32)  # (Q,Q)
        dt_row = dt_col.reshape(1, Q)
        Gxw = Gx * w
        E = scores * Gxw * dt_row

        # --- dC -------------------------------------------------------------
        dC_h = jnp.dot(Gxw * dt_row, Bm, preferred_element_type=jnp.float32)
        dC_h = dC_h + jnp.exp(s_col) * jnp.dot(
            g, h_in, preferred_element_type=jnp.float32
        )
        dC_acc = dC_acc + dC_h

        # --- dB -------------------------------------------------------------
        carry_j = jnp.exp(total - s_col)  # (Q, 1)
        dB_h = dt_col * jnp.dot(Gxw.T, Cm, preferred_element_type=jnp.float32)
        dB_h = dB_h + dt_col * carry_j * jnp.dot(
            x, adj.T, preferred_element_type=jnp.float32
        )
        dB_acc = dB_acc + dB_h

        # --- K, dx ------------------------------------------------------------
        W = jnp.dot(Bm, adj, preferred_element_type=jnp.float32)  # (Q, P)
        K = jnp.dot((scores * w).T, g, preferred_element_type=jnp.float32)
        K = K + carry_j * W
        dx_ref[0, h] = (dt_col * K).astype(dx_ref.dtype)

        # --- da ---------------------------------------------------------------
        PS = jnp.dot(E, strict_upper, preferred_element_type=jnp.float32)
        da = jnp.dot(
            jnp.ones((1, Q), jnp.float32), PS * tril,
            preferred_element_type=jnp.float32,
        ).reshape(Q, 1)
        O = jnp.dot(Cm, h_in.T, preferred_element_type=jnp.float32)  # (Q, P)
        phi = jnp.exp(s_col) * jnp.sum(g * O, axis=1, keepdims=True)
        da = da + jnp.dot(tril.T, phi, preferred_element_type=jnp.float32)
        chi = carry_j * dt_col * jnp.sum(x * W, axis=1, keepdims=True)
        da = da + jnp.dot(strict_upper.T, chi, preferred_element_type=jnp.float32)
        v = jnp.exp(total) * jnp.sum(h_in * adj.T)
        da = da + v
        da_cols.append(da)

        # --- ddt --------------------------------------------------------------
        ddt_cols.append(A * da + jnp.sum(x * K, axis=1, keepdims=True))
        gx_cols.append(jnp.sum(g * x, axis=1, keepdims=True))

        # --- adjoint carry to the earlier chunk --------------------------------
        adj_ref[h] = jnp.exp(total) * adj + jnp.dot(
            (Cm * jnp.exp(s_col)).T, g, preferred_element_type=jnp.float32
        )

    da_all = jnp.concatenate(da_cols, axis=1)  # (Q, Hb)
    ddt_ref[0] = jnp.concatenate(ddt_cols, axis=1).astype(ddt_ref.dtype)
    dB_ref[0] = dB_acc.astype(dB_ref.dtype)
    dC_ref[0] = dC_acc.astype(dC_ref.dtype)
    dA_ref[0, 0, 0] = jnp.sum(dtc * da_all, axis=0).astype(dA_ref.dtype)
    dD_ref[0, 0, 0] = jnp.sum(
        jnp.concatenate(gx_cols, axis=1), axis=0
    ).astype(dD_ref.dtype)


def _bwd_impl(
    x, dt, A, Bmat, Cmat, hin, gy, gstate_t, *, chunk_size, head_tile, interpret
):
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

    xf = x.transpose(0, 2, 1, 3).reshape(Bsz * HT, Hb, Lp, P)
    gf = gy.astype(x.dtype).transpose(0, 2, 1, 3).reshape(Bsz * HT, Hb, Lp, P)
    dt32 = dt.astype(jnp.float32)
    dtc = dt32.reshape(Bsz, Lp, HT, Hb).transpose(0, 2, 1, 3).reshape(Bsz * HT, Lp, Hb)
    Bf = Bmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)
    Cf = Cmat.transpose(0, 2, 1, 3).reshape(Bsz * G, Lp, N)
    A_all = jnp.tile(A.astype(jnp.float32), Bsz)

    def brow(bt):
        return (bt // HT) * G + (bt % HT) // tiles_per_group

    def rc(cr):
        return C - 1 - cr

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bsz * HT, C),
        in_specs=[
            pl.BlockSpec((1, Hb, Q, P), lambda bt, cr, A: (bt, 0, rc(cr), 0)),
            pl.BlockSpec((1, Q, Hb), lambda bt, cr, A: (bt, rc(cr), 0)),
            pl.BlockSpec((1, Hb, Q, P), lambda bt, cr, A: (bt, 0, rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda bt, cr, A: (brow(bt), rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda bt, cr, A: (brow(bt), rc(cr), 0)),
            pl.BlockSpec((1, 1, Hb, P, N), lambda bt, cr, A: (bt, rc(cr), 0, 0, 0)),
            pl.BlockSpec((1, Hb, N, P), lambda bt, cr, A: (bt, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hb, Q, P), lambda bt, cr, A: (bt, 0, rc(cr), 0)),
            pl.BlockSpec((1, Q, Hb), lambda bt, cr, A: (bt, rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda bt, cr, A: (bt, rc(cr), 0)),
            pl.BlockSpec((1, Q, N), lambda bt, cr, A: (bt, rc(cr), 0)),
            pl.BlockSpec((1, 1, 1, Hb), lambda bt, cr, A: (bt, rc(cr), 0, 0)),
            pl.BlockSpec((1, 1, 1, Hb), lambda bt, cr, A: (bt, rc(cr), 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((Hb, N, P), jnp.float32)],
    )

    dx_t, ddt_t, dB_t, dC_t, dA_t, dD_t = pl.pallas_call(
        functools.partial(
            _ssd_bwd_kernel,
            chunk=Q,
            hb=Hb,
            heads_per_batch=H,
            tiles_per_batch=HT,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bsz * HT, Hb, Lp, P), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, Lp, Hb), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, C, 1, Hb), jnp.float32),
            jax.ShapeDtypeStruct((Bsz * HT, C, 1, Hb), jnp.float32),
        ],
        interpret=interpret,
    )(A_all, xf, dtc, gf, Bf, Cf, hin, gstate_t)

    dx = dx_t.reshape(Bsz, H, Lp, P).transpose(0, 2, 1, 3)[:, :L]
    ddt = (
        ddt_t.reshape(Bsz, HT, Lp, Hb).transpose(0, 2, 1, 3).reshape(Bsz, Lp, H)[:, :L]
    )
    dBg = (
        dB_t.reshape(Bsz, G, tiles_per_group, Lp, N).sum(2).transpose(0, 2, 1, 3)[:, :L]
    )
    dCg = (
        dC_t.reshape(Bsz, G, tiles_per_group, Lp, N).sum(2).transpose(0, 2, 1, 3)[:, :L]
    )
    dA = dA_t.reshape(Bsz, HT, C, Hb).sum(axis=(0, 2)).reshape(H)
    dD_head = dD_t.reshape(Bsz, HT, C, Hb).sum(axis=(0, 2)).reshape(H)
    return dx, ddt, dA, dBg, dCg, dD_head


def _chunk_entry_states(x, dt, A, Bmat, chunk_size):
    """Per-chunk entering states (B, C, H, P, N) — the bwd residual."""
    Bsz, L, H, P = x.shape
    G, N = Bmat.shape[2], Bmat.shape[3]
    Q = chunk_size
    pad = (-L) % Q
    Lp = L + pad
    C = Lp // Q
    rep = H // G
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, 0), (0, pad), (0, 0), (0, 0)))

    xc = x.reshape(Bsz, C, Q, H, P).astype(jnp.float32)
    dtc = dt.reshape(Bsz, C, Q, H).astype(jnp.float32)
    a = dtc * A.astype(jnp.float32)[None, None, None]
    s = jnp.cumsum(a, axis=2)
    total = s[:, :, -1, :]
    Bh = jnp.repeat(Bmat.reshape(Bsz, C, Q, G, N).astype(jnp.float32), rep, axis=3)
    state_decay = jnp.exp(total[:, :, None] - s)
    chunk_states = jnp.einsum(
        "bcqhp,bcqhn->bchpn",
        (dtc[..., None] * xc) * state_decay[..., None],
        Bh,
        preferred_element_type=jnp.float32,
    )

    def pass_state(h, inp):
        tot_c, S_c = inp
        return h * jnp.exp(tot_c)[..., None, None] + S_c, h

    _, h_prev = jax.lax.scan(
        pass_state,
        jnp.zeros((Bsz, H, P, N), jnp.float32),
        (jnp.moveaxis(total, 1, 0), jnp.moveaxis(chunk_states, 1, 0)),
    )
    return jnp.moveaxis(h_prev, 0, 1)  # (B, C, H, P, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def ssd_pallas_ad(
    x, dt, A, Bmat, Cmat, D, chunk_size=256, head_tile=None, interpret=None
):
    """Differentiable fused SSD: Pallas forward + Pallas backward.

    Same contract as ``ssd_chunked`` (returns (y, final_state)); training
    selects it via ``scan_impl='pallas_ad'``. ``D=None`` is supported.
    """
    return ssd_pallas(
        x, dt, A, Bmat, Cmat, D,
        chunk_size=chunk_size, head_tile=head_tile, interpret=interpret,
    )


def _fwd(x, dt, A, Bmat, Cmat, D, chunk_size, head_tile, interpret):
    out = ssd_pallas(
        x, dt, A, Bmat, Cmat, D,
        chunk_size=chunk_size, head_tile=head_tile, interpret=interpret,
    )
    return out, (x, dt, A, Bmat, Cmat, D)


def _bwd(chunk_size, head_tile, interpret, res, cts):
    x, dt, A, Bmat, Cmat, D = res
    gy, gstate = cts
    Bsz, L, H, P = x.shape
    G, N = Bmat.shape[2], Bmat.shape[3]
    rep = H // G
    ht = head_tile if head_tile is not None else min(8, rep)
    interp = interpret if interpret is not None else jax.default_backend() != "tpu"
    Q = effective_chunk(chunk_size, interp)

    h_prev = _chunk_entry_states(x, dt, A, Bmat, chunk_size)  # (B, C, H, P, N)
    C = h_prev.shape[1]
    HT = H // ht
    hin = (
        h_prev.transpose(0, 2, 1, 3, 4)
        .reshape(Bsz, HT, ht, C, P, N)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(Bsz * HT, C, ht, P, N)
    )
    gstate_t = (
        gstate.astype(jnp.float32)
        .transpose(0, 1, 3, 2)  # (B, H, N, P)
        .reshape(Bsz, HT, ht, N, P)
        .reshape(Bsz * HT, ht, N, P)
    )

    dx, ddt, dA, dB, dC, dD_head = _bwd_impl(
        x, dt, A, Bmat, Cmat, hin, gy, gstate_t,
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
