"""Whole-model fused decode step: all 48 layers in ONE Pallas kernel.

The XLA scan-based decode step (backbone_step) pays two structural taxes at
1.3B scale that no fusion pass removes:

- ``lax.scan`` over the stacked layer weights DYNAMIC-SLICES each layer's
  ~50 MB slab out of HBM every token (~90 us/layer measured — a pure copy);
- each sub-op (in_proj, conv update, state update, gated norm, out_proj) is
  its own fusion with HBM round-trips for the (B, d)-sized intermediates
  and no cross-layer weight prefetch.

Decode is HBM-bandwidth-bound (weights + recurrent state per token, zero
reuse), so the kernel is organised as a bandwidth pump: the grid walks
(layer, head-tile); BlockSpec index maps stream each layer's weight slabs
and state tiles while the previous tile computes (Pallas double-buffers
automatically), the (B, d) hidden/residual stream lives in VMEM scratch for
the whole 48-layer sweep, and the conv/SSM states are updated IN PLACE via
input_output_aliases. This is the TPU answer to the reference's CUDA-graph
decode capture (models/stage2/generation.py:296-434) — but it also removes
the per-layer weight-copy tax that XLA's while/scan structure imposes.

Semantics mirror block_step exactly (blocks.py:100-136): pre-norm
residual-add in fp32, LoRA'd in_proj, causal-conv shift-register update,
``h' = e^{dt A} h + dt x B^T``, ``y = C h' + D x``, gated RMSNorm, out_proj.
Supports bf16/fp32 weights and the int8 {q, scale} decode quantization
(ops/quant.py) — int8 slabs are dequantized in VMEM after the (int8-sized)
DMA, which is where the bandwidth win lives.

Head tiling: the SSM state tile (B, Hb, P, N) is the biggest VMEM resident;
Hb=16 keeps it at 16.8 MB (bf16) at the B=64 serving batch.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedDecodeCache(NamedTuple):
    """Decode state in the fused kernel's layout (split conv channels so
    the x / bc ranges alias cleanly as separate in-place operands)."""

    conv_x: jax.Array  # (n_layer, B, W-1, d_inner)
    conv_bc: jax.Array  # (n_layer, B, W-1, 2*G*N)
    ssm: jax.Array  # (n_layer, B, H*P, N) fp32 or bf16 — head-FLAT layout


def to_fused_cache(cache, d_inner: int) -> FusedDecodeCache:
    """Split a BackboneCache's combined [x|bc] conv channels and flatten the
    SSM (head, headdim) axes (same HBM bytes — (H, P) are adjacent).

    The batch axis is padded up to a multiple of 8 (TPU sublane): Mosaic
    has no lowering for (1, X) row-reductions ("Offset change"), and decode
    below B=8 is weight-bound anyway, so the pad rows are free. The step fn
    slices real rows back out of the activation outputs; state rows simply
    carry zeros."""
    L, B, H, P, N = cache.ssm_state.shape
    Bp = -(-B // 8) * 8
    pad = [(0, 0), (0, Bp - B)] + [(0, 0)] * 2
    return FusedDecodeCache(
        conv_x=jnp.pad(cache.conv_state[..., :d_inner], pad),
        conv_bc=jnp.pad(cache.conv_state[..., d_inner:], pad),
        ssm=jnp.pad(cache.ssm_state.reshape(L, B, H * P, N), pad),
    )


def _mm(h, w_ref, scale_ref, quant: bool):
    """hnorm @ W with optional int8 dequant; fp32 accumulation. The int8
    slab is converted in VMEM — the HBM DMA stays int8-sized."""
    w = w_ref[0]
    if w.ndim == 3:  # tile-major (1, d, cols) weight (e.g. dt)
        w = w[0]
    if quant:
        w = w.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if quant:
        s = scale_ref[0]
        out = out * s.reshape(1, -1).astype(jnp.float32)
    return out


def _conv_step(raw, state_ref, out_ref, w_ref, b_ref):
    """Shift-register causal-conv update (conv.py:73-93 semantics).

    raw: (B, C) fp32; state/out blocks (1, B, W-1, C). Returns silu'd
    (B, C) fp32 and writes the shifted window to the (aliased) output."""
    st = state_ref[0].astype(jnp.float32)  # (B, W-1, C)
    w = w_ref[0].astype(jnp.float32)  # (W, C)
    Wk = w.shape[0]
    y = raw * w[Wk - 1][None]
    for i in range(Wk - 1):
        y = y + st[:, i, :] * w[i][None]
    y = y + b_ref[0].astype(jnp.float32)  # (1, C) broadcast
    y = jax.nn.silu(y)
    new_st = jnp.concatenate([st[:, 1:, :], raw[:, None, :]], axis=1)
    out_ref[0] = new_st.astype(out_ref.dtype)
    return y


def _fused_decode_kernel(
    # --- per-layer weight blocks -----------------------------------------
    # (per-layer vectors carry a unit axis so the last-two block dims obey
    # the Mosaic (8, 128)-or-full rule)
    norm_w_ref,  # (1, 1, d)
    wz_ref,  # (1, d, TW)        TW = Hb*P, tile slice
    wz_s_ref,  # (1, 1, TW) int8 scale (dummy when not quant)
    wx_ref,  # (1, d, TW)
    wx_s_ref,  # (1, 1, TW)
    wbc_ref,  # (1, d, 2GN)
    wbc_s_ref,  # (1, 1, 2GN)
    wdt_ref,  # (1, 1, d, Hb)   tile-major: (L, T, d, Hb)
    wdt_s_ref,  # (1, 1, 1, Hb)
    la_ref,  # (1, d, r) lora A (task-selected)
    lbz_ref,  # (1, r, TW)
    lbx_ref,  # (1, r, TW)
    lbbc_ref,  # (1, r, 2GN)
    lbdt_ref,  # (1, 1, r, Hb)
    convwx_ref,  # (1, W, TW)
    convbx_ref,  # (1, 1, TW)
    convwbc_ref,  # (1, W, 2GN)
    convbbc_ref,  # (1, 1, 2GN)
    dtb_ref,  # (1, 1, 1, Hb)
    alog_ref,  # (1, 1, 1, TW) pre-expanded per-head -> per-channel
    dd_ref,  # (1, 1, 1, TW) pre-expanded
    gnorm_ref,  # (1, 1, TW) tile slice
    wout_ref,  # (1, TW, d) tile rows
    wout_s_ref,  # (1, 1, d)
    # --- streamed state / activations ------------------------------------
    h_in_ref,  # (B, d)
    res_in_ref,  # (B, d) fp32
    convx_ref,  # (1, B, W-1, TW) aliased -> out
    convbc_ref,  # (1, B, W-1, 2GN) aliased -> out
    ssm_ref,  # (1, B, Hb*P, N) aliased -> out (head-flat)
    # --- outputs ----------------------------------------------------------
    convx_out_ref,
    convbc_out_ref,
    ssm_out_ref,
    h_out_ref,  # (B, d)
    res_out_ref,  # (B, d) fp32
    # --- scratch ------------------------------------------------------------
    h_s,  # (B, d) io dtype
    res_s,  # (B, d) fp32
    hn_s,  # (B, d) io dtype (normed)
    out_acc,  # (B, d) fp32 out_proj partial accumulator
    sumsq,  # (B, 1) fp32 gated-norm sum of squares
    bc_s,  # (B, 2GN) fp32
    *,
    n_layer: int,
    tiles: int,
    hb: int,
    headdim: int,
    lora_scale: float,
    quant: Tuple[bool, bool, bool, bool, bool],  # (z, x, bc, dt, out)
    norm_eps: float,
    gn_eps: float,
):
    qz, qx, qbc, qdt, qo = quant
    l = pl.program_id(0)
    t = pl.program_id(1)
    TW = hb * headdim
    B = h_in_ref.shape[0]
    N = ssm_ref.shape[3]

    # ---- once per layer: pre-norm + the group-shared B/C path ------------
    @pl.when(t == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_s[...] = h_in_ref[...]
            res_s[...] = res_in_ref[...]

        res = h_s[...].astype(jnp.float32) + res_s[...]
        res_s[...] = res
        var = jnp.mean(res * res, axis=-1, keepdims=True)
        hn = res * jax.lax.rsqrt(var + norm_eps) * norm_w_ref[0].astype(
            jnp.float32
        )
        hn_s[...] = hn.astype(hn_s.dtype)

        hn_io = hn_s[...]
        bc_raw = _mm(hn_io, wbc_ref, wbc_s_ref, qbc)
        hA = jnp.dot(
            hn_io.astype(jnp.float32), la_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        bc_raw = bc_raw + lora_scale * jnp.dot(
            hA, lbbc_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        bc_s[...] = _conv_step(
            bc_raw, convbc_ref, convbc_out_ref, convwbc_ref, convbbc_ref
        )

    hn = hn_s[...]
    hA = jnp.dot(
        hn.astype(jnp.float32), la_ref[0].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (B, r)

    # ---- per tile: z / x / dt projections --------------------------------
    z_t = _mm(hn, wz_ref, wz_s_ref, qz) + lora_scale * jnp.dot(
        hA, lbz_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32
    )

    x_raw = _mm(hn, wx_ref, wx_s_ref, qx) + lora_scale * jnp.dot(
        hA, lbx_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32
    )
    xs = _conv_step(
        x_raw, convx_ref, convx_out_ref, convwx_ref, convbx_ref
    )  # (B, TW) fp32

    dt_raw = _mm(hn, wdt_ref, wdt_s_ref, qdt) + lora_scale * jnp.dot(
        hA, lbdt_ref[0][0].astype(jnp.float32), preferred_element_type=jnp.float32
    )
    dt = jax.nn.softplus(dt_raw + dtb_ref[0, 0].astype(jnp.float32))  # (B,Hb)

    # ---- SSM state update (in place), head-FLAT form ----------------------
    # The state tile is (B, Hb*P, N) — merging (head, headdim) avoids Mosaic
    # shape casts. Per-head scalars broadcast to the flat axis through a tiny
    # iota-mask matmul (E[h, c] = [c // P == h]); A and D arrive pre-expanded
    # from the host.
    hrow = jax.lax.broadcasted_iota(jnp.int32, (hb, TW), 0)
    hcol = jax.lax.broadcasted_iota(jnp.int32, (hb, TW), 1) // headdim
    E = (hrow == hcol).astype(jnp.float32)  # (Hb, TW)
    dtf = jnp.dot(dt, E, preferred_element_type=jnp.float32)  # (B, TW)
    A_flat = -jnp.exp(alog_ref[0, 0].astype(jnp.float32))  # (1, TW)
    decay = jnp.exp(dtf * A_flat)  # (B, TW)
    Bv = bc_s[:, :N]  # (B, N) fp32
    Cv = bc_s[:, N:]
    st = ssm_ref[0].astype(jnp.float32)  # (B, TW, N)
    st = st * decay[..., None] + (dtf * xs)[..., None] * Bv[:, None, :]
    ssm_out_ref[0] = st.astype(ssm_out_ref.dtype)
    y = jnp.sum(st * Cv[:, None, :], axis=-1)  # (B, TW)
    y = y + xs * dd_ref[0, 0].astype(jnp.float32)  # D pre-expanded (1, TW)

    # ---- gated RMSNorm + out_proj, tile-accumulated -----------------------
    # RMSNorm's rsqrt(mean(yf^2)) is a per-ROW scalar, so it commutes with
    # the out_proj matmul: accumulate (yf ∘ w_gn) @ Wout[tile rows] and the
    # per-row sum of squares across tiles, scale once at the last tile. This
    # splits the 16.8 MB out_proj slab across tiles and needs no full-width
    # y/z scratch.
    yf = y * jax.nn.silu(z_t)  # (B, TW) fp32
    part = _mm(
        (yf * gnorm_ref[0].astype(jnp.float32)).astype(h_s.dtype),
        wout_ref, wout_s_ref, qo,
    )  # (B, d) fp32
    ss = jnp.sum(yf * yf, axis=-1, keepdims=True)  # (B, 1)

    @pl.when(t == 0)
    def _():
        out_acc[...] = part
        sumsq[...] = ss

    @pl.when(t != 0)
    def _():
        out_acc[...] = out_acc[...] + part
        sumsq[...] = sumsq[...] + ss

    @pl.when(t == tiles - 1)
    def _():
        d_inner = TW * tiles
        var = sumsq[...] / d_inner
        h_s[...] = (out_acc[...] * jax.lax.rsqrt(var + gn_eps)).astype(h_s.dtype)

        @pl.when(l == n_layer - 1)
        def _():
            h_out_ref[...] = h_s[...]
            res_out_ref[...] = res_s[...]


def _wq(entry):
    """(weight, scale, is_quant) from a param entry — a bare array,
    {'kernel': w}, {'q', 'scale'}, or {'kernel': {'q', 'scale'}}."""
    while isinstance(entry, dict):
        if "q" in entry:
            return entry["q"], entry["scale"], True
        entry = entry["kernel"]
    return entry, None, False


@functools.partial(
    jax.jit,
    static_argnames=(
        "lora_scale", "head_tile", "norm_eps", "gn_eps", "interpret",
        "alias_states",
    ),
)
def fused_decode_step(
    layers: Dict,  # stacked params["layers"] pytree (homogeneous Mamba2)
    h: jax.Array,  # (B, d) embedded token
    residual: jax.Array,  # (B, d) fp32
    cache: FusedDecodeCache,
    task_lora_A: Optional[jax.Array],  # (L, d, r) pre-selected, or None
    task_lora_B: Optional[Dict],  # {part: (L, r, dims)} or None
    lora_scale: float,
    *,
    head_tile: int = 16,
    norm_eps: float = 1e-5,
    gn_eps: float = 1e-5,
    interpret: Optional[bool] = None,
    alias_states: bool = True,
) -> Tuple[jax.Array, jax.Array, FusedDecodeCache]:
    """One decode token through the whole stack. Returns
    (h_out (B, d), residual_out fp32, new cache)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mixer = layers["mixer"]
    wz, sz, qz = _wq(mixer["in_proj"]["z"])
    wx, sx, qx = _wq(mixer["in_proj"]["x"])
    wbc, sbc, qbc = _wq(mixer["in_proj"]["bc"])
    wdt, sdt, qdt = _wq(mixer["in_proj"]["dt"])
    wout, sout, qo = _wq(mixer["out_proj"])
    quant = (qz, qx, qbc, qdt, qo)

    L, d, d_inner = wz.shape
    B_real = h.shape[0]
    B = cache.ssm.shape[1]  # sublane-padded by to_fused_cache
    if B_real != B:
        h = jnp.pad(h, ((0, B - B_real), (0, 0)))
        residual = jnp.pad(residual, ((0, B - B_real), (0, 0)))
    assert cache.ssm.shape[-1] * 2 == wbc.shape[2], (
        "fused decode supports ngroups=1 (every shipped config)"
    )
    Wk = mixer["conv"]["weight_x"].shape[1]
    H = mixer["A_log"].shape[1]
    P = d_inner // H
    GN2 = wbc.shape[2]
    N = cache.ssm.shape[-1]
    # The SSM tile (B, Hb*P, N) is double-buffered in AND out (4 VMEM
    # copies) — keep it <= ~8.5 MB so the whole pipeline fits 128M VMEM
    state_bytes = jnp.dtype(cache.ssm.dtype).itemsize
    Hb = min(head_tile, H)
    while Hb > 8 and B * Hb * P * N * state_bytes > 8.5 * 1024 * 1024:
        Hb //= 2
    T = H // Hb
    TW = Hb * P
    r = task_lora_A.shape[-1] if task_lora_A is not None else 1

    def dummy_scale(cols):
        return jnp.ones((L, cols), jnp.float32)

    sz = sz if sz is not None else dummy_scale(d_inner)
    sx = sx if sx is not None else dummy_scale(d_inner)
    sbc = sbc if sbc is not None else dummy_scale(GN2)
    sdt = sdt if sdt is not None else dummy_scale(H)
    sout = sout if sout is not None else dummy_scale(d)
    if task_lora_A is not None and task_lora_A.ndim == 4:
        # (L, lora_nums, d, r): the fused path supports lora_nums == 1
        assert task_lora_A.shape[1] == 1, "fused decode supports lora_nums=1"
        task_lora_A = task_lora_A[:, 0]
        task_lora_B = {k: v[:, 0] for k, v in task_lora_B.items()}
    if task_lora_A is None:
        task_lora_A = jnp.zeros((L, d, r), h.dtype)
        task_lora_B = {
            "z": jnp.zeros((L, r, d_inner), h.dtype),
            "x": jnp.zeros((L, r, d_inner), h.dtype),
            "bc": jnp.zeros((L, r, GN2), h.dtype),
            "dt": jnp.zeros((L, r, H), h.dtype),
        }
        lora_scale = 0.0

    # head-sliced weight views (z/x cols are head-major: h*P+p). Per-layer
    # vectors get a unit middle axis, per-head-tile vectors go tile-major
    # (L, T, 1, Hb) — Mosaic requires last-two block dims (8k, 128k) or full.
    def lt(shape, imap):
        return pl.BlockSpec(shape, imap)

    def v3(a):  # (L, X) -> (L, 1, X)
        return a.reshape(L, 1, -1)

    def t4(a):  # (L, H) -> (L, T, 1, Hb)
        return a.reshape(L, T, 1, Hb)

    in_specs = [
        lt((1, 1, d), lambda l, t: (l, 0, 0)),  # norm_w
        lt((1, d, TW), lambda l, t: (l, 0, t)),  # wz
        lt((1, 1, TW), lambda l, t: (l, 0, t)),  # sz
        lt((1, d, TW), lambda l, t: (l, 0, t)),  # wx
        lt((1, 1, TW), lambda l, t: (l, 0, t)),  # sx
        lt((1, d, GN2), lambda l, t: (l, 0, 0)),  # wbc
        lt((1, 1, GN2), lambda l, t: (l, 0, 0)),  # sbc
        lt((1, 1, d, Hb), lambda l, t: (l, t, 0, 0)),  # wdt (L,T,d,Hb)
        lt((1, 1, 1, Hb), lambda l, t: (l, t, 0, 0)),  # sdt
        lt((1, d, r), lambda l, t: (l, 0, 0)),  # lora A
        lt((1, r, TW), lambda l, t: (l, 0, t)),  # lora B z
        lt((1, r, TW), lambda l, t: (l, 0, t)),  # lora B x
        lt((1, r, GN2), lambda l, t: (l, 0, 0)),  # lora B bc
        lt((1, 1, r, Hb), lambda l, t: (l, t, 0, 0)),  # lora B dt (L,T,r,Hb)
        lt((1, Wk, TW), lambda l, t: (l, 0, t)),  # conv w x
        lt((1, 1, TW), lambda l, t: (l, 0, t)),  # conv b x
        lt((1, Wk, GN2), lambda l, t: (l, 0, 0)),  # conv w bc
        lt((1, 1, GN2), lambda l, t: (l, 0, 0)),  # conv b bc
        lt((1, 1, 1, Hb), lambda l, t: (l, t, 0, 0)),  # dt_bias
        lt((1, 1, 1, TW), lambda l, t: (l, t, 0, 0)),  # A_log (expanded)
        lt((1, 1, 1, TW), lambda l, t: (l, t, 0, 0)),  # D (expanded)
        lt((1, 1, TW), lambda l, t: (l, 0, t)),  # gated-norm w (tile slice)
        lt((1, TW, d), lambda l, t: (l, t, 0)),  # wout (tile rows)
        lt((1, 1, d), lambda l, t: (l, 0, 0)),  # sout
        lt((B, d), lambda l, t: (0, 0)),  # h_in
        lt((B, d), lambda l, t: (0, 0)),  # res_in
        lt((1, B, Wk - 1, TW), lambda l, t: (l, 0, 0, t)),  # conv_x state
        lt((1, B, Wk - 1, GN2), lambda l, t: (l, 0, 0, 0)),  # conv_bc state
        lt((1, B, TW, N), lambda l, t: (l, 0, t, 0)),  # ssm state (flat)
    ]
    out_specs = [
        lt((1, B, Wk - 1, TW), lambda l, t: (l, 0, 0, t)),
        lt((1, B, Wk - 1, GN2), lambda l, t: (l, 0, 0, 0)),
        lt((1, B, TW, N), lambda l, t: (l, 0, t, 0)),
        lt((B, d), lambda l, t: (0, 0)),
        lt((B, d), lambda l, t: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(cache.conv_x.shape, cache.conv_x.dtype),
        jax.ShapeDtypeStruct(cache.conv_bc.shape, cache.conv_bc.dtype),
        jax.ShapeDtypeStruct(cache.ssm.shape, cache.ssm.dtype),
        jax.ShapeDtypeStruct((B, d), h.dtype),
        jax.ShapeDtypeStruct((B, d), jnp.float32),
    ]

    conv = mixer["conv"]
    inputs = (
        v3(layers["norm"]["weight"]),
        wz, v3(sz), wx, v3(sx), wbc, v3(sbc),
        wdt.reshape(L, d, T, Hb).transpose(0, 2, 1, 3), t4(sdt),
        task_lora_A,
        task_lora_B["z"], task_lora_B["x"], task_lora_B["bc"],
        task_lora_B["dt"].reshape(L, r, T, Hb).transpose(0, 2, 1, 3),
        conv["weight_x"], v3(conv["bias_x"]),
        conv["weight_bc"], v3(conv["bias_bc"]),
        t4(mixer["dt_bias"]),
        jnp.repeat(mixer["A_log"], P, axis=1).reshape(L, T, 1, TW),
        jnp.repeat(mixer["D"], P, axis=1).reshape(L, T, 1, TW),
        v3(mixer["norm"]["weight"]),
        wout, v3(sout),
        h, residual.astype(jnp.float32),
        cache.conv_x, cache.conv_bc, cache.ssm,
    )
    n_in = len(inputs)

    convx_o, convbc_o, ssm_o, h_out, res_out = pl.pallas_call(
        functools.partial(
            _fused_decode_kernel,
            n_layer=L,
            tiles=T,
            hb=Hb,
            headdim=P,
            lora_scale=float(lora_scale),
            quant=quant,
            norm_eps=norm_eps,
            gn_eps=gn_eps,
        ),
        grid=(L, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, d), h.dtype),  # h_s
            pltpu.VMEM((B, d), jnp.float32),  # res_s
            pltpu.VMEM((B, d), h.dtype),  # hn_s
            pltpu.VMEM((B, d), jnp.float32),  # out_acc
            pltpu.VMEM((B, 1), jnp.float32),  # sumsq
            pltpu.VMEM((B, GN2), jnp.float32),  # bc_s
        ],
        input_output_aliases=(
            {n_in - 3: 0, n_in - 2: 1, n_in - 1: 2} if alias_states else {}
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*inputs)

    return (
        h_out[:B_real],
        res_out[:B_real],
        FusedDecodeCache(convx_o, convbc_o, ssm_o),
    )
