"""Sequential (eager) Mamba-2 SSD recurrence — the correctness oracle.

Computes, per head h with scalar decay A_h and per-step dt:

    h_t = exp(dt_t * A_h) * h_{t-1} + dt_t * (B_t outer x_t)
    y_t = C_t . h_t + D_h * x_t

This is the semantic ground truth for the chunked XLA implementation
(``ssd_chunked.py``) and the Pallas kernel (``ssd_pallas.py``), mirroring the
role of the "eager path" called out in BASELINE.json ("token-stream match vs
reference eager-scan greedy decode"). The reference's equivalent lives in the
external Triton kernels ``ssd_combined`` of mamba_ssm 2.2.2 (SURVEY §2.3
row 1); this file re-derives the math rather than porting the kernels.

State is kept in fp32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def ssd_scan_reference(
    x: jax.Array,  # (B, L, H, P)
    dt: jax.Array,  # (B, L, H)  already softplus'ed, includes dt_bias
    A: jax.Array,  # (H,)       negative decay rates (-exp(A_log))
    Bmat: jax.Array,  # (B, L, G, N)
    Cmat: jax.Array,  # (B, L, G, N)
    D: Optional[jax.Array] = None,  # (H,)
    *,
    initial_state: Optional[jax.Array] = None,  # (B, H, P, N) fp32
) -> Tuple[jax.Array, jax.Array]:
    """Returns (y, final_state) with y: (B, L, H, P), state fp32 (B, H, P, N)."""
    Bsz, L, H, P = x.shape
    G = Bmat.shape[2]
    N = Bmat.shape[3]
    assert H % G == 0
    rep = H // G

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Bf = jnp.repeat(Bmat.astype(jnp.float32), rep, axis=2)  # (B, L, H, N)
    Cf = jnp.repeat(Cmat.astype(jnp.float32), rep, axis=2)
    Af = A.astype(jnp.float32)

    if initial_state is None:
        h0 = jnp.zeros((Bsz, H, P, N), dtype=jnp.float32)
    else:
        h0 = initial_state.astype(jnp.float32)

    def step(h, inputs):
        x_t, dt_t, B_t, C_t = inputs  # (B,H,P), (B,H), (B,H,N), (B,H,N)
        decay = jnp.exp(dt_t * Af)  # (B, H)
        dBx = jnp.einsum("bhp,bhn->bhpn", dt_t[..., None] * x_t, B_t)
        h = h * decay[..., None, None] + dBx
        y_t = jnp.einsum("bhpn,bhn->bhp", h, C_t)
        return h, y_t

    xs = (
        jnp.moveaxis(xf, 1, 0),
        jnp.moveaxis(dtf, 1, 0),
        jnp.moveaxis(Bf, 1, 0),
        jnp.moveaxis(Cf, 1, 0),
    )
    final_state, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1)  # (B, L, H, P)
    if D is not None:
        y = y + xf * D.astype(jnp.float32)[None, None, :, None]
    return y.astype(x.dtype), final_state


def ssd_step(
    x_t: jax.Array,  # (B, H, P)
    dt_t: jax.Array,  # (B, H) softplus'ed
    A: jax.Array,  # (H,)
    B_t: jax.Array,  # (B, G, N)
    C_t: jax.Array,  # (B, G, N)
    D: Optional[jax.Array],  # (H,)
    state: jax.Array,  # (B, H, P, N) fp32
) -> Tuple[jax.Array, jax.Array]:
    """O(1) recurrent decode step — TPU analog of CUDA
    ``selective_state_update`` (SURVEY §2.3 row 1, decode path).

    Returns (y_t (B,H,P) in x dtype, new_state fp32).

    At serving batches (B >= 16) the contraction is DISTRIBUTED over the
    update (exact algebra):

        y = (s·decay + dtx⊗B)·C  =  decay·(s·C) + dtx·(B·C)

    so the state tensor — the dominant HBM traffic of batched decode — is
    consumed by ONE multi-output XLA fusion (y's reduction reads ``s``
    directly instead of the materialized new_state): measured 351 vs
    482 us/layer-step at B=96 on v5e (70% vs 51% of the state r+w floor;
    a fused Pallas step kernel topped out slower than either — VPU
    cross-lane reduction cost, ops/ssd_step_pallas.py — and a plain Pallas
    copy of the same bytes runs at 69%, so 70% is the practical ceiling).
    End-to-end r3: MMU B=96 3067 -> 3533 tok/s, T2I B=48 10.1 -> 10.9
    img/s. At SMALL batch the state is not the bottleneck and the extra
    fusion costs dispatch time (B=1 int8: 284 -> 194 tok/s measured), so
    the naive single-expression form is kept below B=16. new_state is
    bit-identical between forms; y differs only in summation order
    (bf16-ulp scale).
    """
    Bsz, H, P = x_t.shape
    G = B_t.shape[1]
    rep = H // G
    Bf = jnp.repeat(B_t.astype(jnp.float32), rep, axis=1)  # (B,H,N)
    Cf = jnp.repeat(C_t.astype(jnp.float32), rep, axis=1)
    dtf = dt_t.astype(jnp.float32)
    xf = x_t.astype(jnp.float32)

    decay = jnp.exp(dtf * A.astype(jnp.float32))  # (B,H)
    dtx = dtf[..., None] * xf  # (B,H,P)
    # scaled-int8 state (ops/quant.quantize_ssm_state): dict {"q","scale"}
    # — dequantize into registers, requantize the update on the way out;
    # the carried HBM traffic (this step's bottleneck at serving batches)
    # is the int8 tensor + per-row scales
    quantized = isinstance(state, dict)
    if quantized:
        from omnimamba_tpu.ops.quant import dequantize_ssm_state

        sf = dequantize_ssm_state(state)
    else:
        sf = state.astype(jnp.float32)
    if Bsz >= 16:  # static under jit: one compiled branch
        sC = jnp.einsum("bhpn,bhn->bhp", sf, Cf)
        BC = jnp.einsum("bhn,bhn->bh", Bf, Cf)
        y = decay[..., None] * sC + dtx * BC[..., None]
        new_state = sf * decay[..., None, None] + jnp.einsum(
            "bhp,bhn->bhpn", dtx, Bf)
    else:
        new_state = sf * decay[..., None, None] + jnp.einsum(
            "bhp,bhn->bhpn", dtx, Bf)
        y = jnp.einsum("bhpn,bhn->bhp", new_state, Cf)
    if D is not None:
        y = y + xf * D.astype(jnp.float32)[None, :, None]
    # state dtype follows the carried cache (fp32 default; bf16 halves the
    # dominant HBM traffic of batched decode at some fidelity cost; scaled
    # int8 halves it again)
    if quantized:
        from omnimamba_tpu.ops.quant import quantize_ssm_state

        return y.astype(x_t.dtype), quantize_ssm_state(new_state)
    return y.astype(x_t.dtype), new_state.astype(state.dtype)
