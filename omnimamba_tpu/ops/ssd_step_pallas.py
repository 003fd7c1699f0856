"""Fused Pallas decode-step kernel — a MEASURED NEGATIVE, kept for the record.

Motivation: the old XLA lowering of ``ops/ssd_reference.ssd_step`` ran at
51% of the state r+w floor at B=96 (the update and the C-contraction
landed in separate fusions, each streaming the (B, H, P, N) state). This
kernel was built to guarantee one read + one write:

    new_state = state * decay[h] + (dt*x)_h ⊗ B_h      (fp32 in VMEM)
    y_h       = Σ_n new_state * C_h                    (lane reduction)

Measured on v5e at B=96 (48*20 layer-steps, /tmp harness, r3):
  - per-head-unrolled variant (16 small 2-D ops/tile):  1648 us/layer-step
  - this vectorized folded-(hb*P, N) variant:           2438 us
  - plain Pallas COPY of the same bytes (DMA ceiling):   358 us (69% floor)
  - old XLA ssd_step:                                    482 us (51%)
  - XLA with the distributed-contraction rewrite
    (now the shipped ``ssd_step``):                      351 us (70%)

Diagnosis: the VPU cost of the in-kernel cross-lane reduction plus the
fp32 elementwise passes (~6 us per 262K-element tile, vs ~1 us roofline)
dominates — a compute-bound kernel on a bandwidth-bound op. The algebraic
rewrite (y = decay*(s·C) + dtx*(B·C)) gives XLA a single multi-output
fusion over one state read and reaches the DMA ceiling without Pallas.
Kept (with tests) as the reference point for future Mosaic revisits.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _step_kernel(
    state_ref,  # (1, hb*P, N) in state dtype
    dtx_ref,  # (1, hb*P, 1) fp32 (dt * x), folded layout
    decay_ref,  # (1, hb*P, 1) fp32 exp(dt * A), folded layout
    B_ref,  # (1, hb, N) fp32
    C_ref,  # (1, hb, N) fp32
    ns_ref,  # (1, hb*P, N) out, aliased onto state_ref's buffer
    y_ref,  # (1, hb*P, 1) out fp32
    *,
    p: int,
    interpret: bool,
):
    s = state_ref[0].astype(jnp.float32)  # (hb*P, N)
    hb = B_ref.shape[1]
    # expand per-head rows to the folded (hb*P, N) layout in-VMEM: a
    # broadcast along the middle (sublane-batch) dim + a layout-free
    # reshape — never through HBM
    Bfull = jnp.broadcast_to(
        B_ref[0][:, None, :], (hb, p, B_ref.shape[2])
    ).reshape(hb * p, B_ref.shape[2])
    Cfull = jnp.broadcast_to(
        C_ref[0][:, None, :], (hb, p, C_ref.shape[2])
    ).reshape(hb * p, C_ref.shape[2])
    ns = s * decay_ref[0] + dtx_ref[0] * Bfull  # (hb*P, N) fp32
    y = jnp.sum(ns * Cfull, axis=1, keepdims=True)  # (hb*P, 1)
    ns_ref[0] = ns.astype(ns_ref.dtype)
    y_ref[0] = y


@functools.partial(jax.jit, static_argnames=("head_tile", "interpret"))
def ssd_step_pallas(
    x_t: jax.Array,  # (B, H, P)
    dt_t: jax.Array,  # (B, H) softplus'ed fp32
    A: jax.Array,  # (H,) fp32 (negative)
    B_t: jax.Array,  # (B, G, N)
    C_t: jax.Array,  # (B, G, N)
    D,  # (H,) or None
    state: jax.Array,  # (B, H, P, N) carried dtype (fp32 or bf16)
    *,
    head_tile: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops/ssd_reference.ssd_step (same signature/semantics):
    returns (y (B,H,P) in x dtype, new_state in state dtype)."""
    Bsz, H, P = x_t.shape
    G, N = B_t.shape[1], B_t.shape[2]
    rep = H // G
    hb = min(head_tile, H)
    assert H % hb == 0, (H, hb)

    dtf = dt_t.astype(jnp.float32)
    # folded (B, H*P, 1) broadcasts — tiny (B*H*P*4 bytes)
    dtx = (dtf[..., None] * x_t.astype(jnp.float32)).reshape(Bsz, H * P, 1)
    decay = jnp.broadcast_to(
        jnp.exp(dtf * A.astype(jnp.float32))[..., None], (Bsz, H, P)
    ).reshape(Bsz, H * P, 1)
    Bf = jnp.repeat(B_t.astype(jnp.float32), rep, axis=1)  # (B, H, N)
    Cf = jnp.repeat(C_t.astype(jnp.float32), rep, axis=1)
    state2d = state.reshape(Bsz, H * P, N)

    grid = (Bsz, H // hb)
    ns, y = pl.pallas_call(
        functools.partial(_step_kernel, p=P, interpret=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb * P, N), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, hb * P, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, hb * P, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, hb, N), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, hb, N), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hb * P, N), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, hb * P, 1), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state2d.shape, state.dtype),
            jax.ShapeDtypeStruct((Bsz, H * P, 1), jnp.float32),
        ],
        input_output_aliases={0: 0},  # state buffer reused for new_state
        interpret=interpret,
    )(state2d, dtx, decay, Bf, Cf)

    y = y.reshape(Bsz, H, P)
    if D is not None:
        y = y + x_t.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    return y.astype(x_t.dtype), ns.reshape(state.shape)
