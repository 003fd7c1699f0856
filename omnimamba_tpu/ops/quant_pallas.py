"""Fused int8 weight-only matmul kernel for the decode path.

XLA's handling of ``x @ w_int8.astype(bf16) * scale`` recovers only part of
the int8 bandwidth win in the full decode step (~415 GB/s effective weight
read vs ~620 GB/s for plain bf16 — the upcast materializes traffic). This
kernel guarantees the intended dataflow: int8 weight tiles stream
HBM -> VMEM, upcast happens in-registers feeding the MXU, and the
per-out-channel scale is applied to the accumulator.

Two contraction layouts cover every quantized site:
- kernel (K, O) int8, scale (O,):  out[b, o] = sum_k x[b,k] q[k,o] * s[o]
- table  (O, K) int8 ("transpose"; weight-tied heads): contract K.

Used by ``ops/quant.matmul_any`` for 2-D activations on TPU (decode steps);
prefill/training keep the XLA path (autodiff, large-batch fusion).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, *, transpose: bool):
    x = x_ref[...]  # (B, K) bf16
    q = q_ref[...]  # (K, TO) or (TO, K) int8
    if transpose:
        acc = jax.lax.dot_general(
            x, q.astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, TO)
    else:
        acc = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("transpose", "tile_o", "interpret"))
def qmatmul_pallas(
    x: jax.Array,  # (B, K) activation dtype
    q: jax.Array,  # (K, O) int8, or (O, K) when transpose
    scale: jax.Array,  # (O,)
    *,
    transpose: bool = False,
    tile_o: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, K = x.shape
    O = q.shape[0] if transpose else q.shape[1]
    pad_o = (-O) % tile_o
    Op = O + pad_o
    if pad_o:
        if transpose:
            q = jnp.pad(q, ((0, pad_o), (0, 0)))
        else:
            q = jnp.pad(q, ((0, 0), (0, pad_o)))
        scale = jnp.pad(scale, (0, pad_o))
    scale2 = scale.reshape(1, Op)

    if transpose:
        q_spec = pl.BlockSpec((tile_o, K), lambda i: (i, 0))
    else:
        q_spec = pl.BlockSpec((K, tile_o), lambda i: (0, i))

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, transpose=transpose),
        grid=(Op // tile_o,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            q_spec,
            pl.BlockSpec((1, tile_o), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, tile_o), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, Op), x.dtype),
        interpret=interpret,
    )(x, q, scale2)
    return out[:, :O]
