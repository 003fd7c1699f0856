"""Normalization ops with the reference's fused-add-norm semantics.

The reference uses Triton ``layer_norm_fn`` for a fused residual-add +
RMSNorm with an fp32 residual stream (``models/stage2/block.py:86-95``,
``mixer_seq_simple.py:428-437``). On TPU, XLA fuses these elementwise chains
natively, so these are plain jnp functions written to preserve the exact
numerics contract:

- residual accumulates in fp32 when ``residual_in_fp32`` (config_mamba.py:20)
- the norm itself always computes its statistics in fp32
- the normalized output is cast back to the activation dtype
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Fused Pallas add+RMSNorm (ops/norms_pallas.py): one fwd pass + one bwd
# pass over the activations instead of XLA's multi-pass schedule (~33 ms of
# a 343 ms 1.3B train step vs a ~13 ms bandwidth floor, r3 trace). Opt-in
# until its on-hardware A/B is recorded: OMNIMAMBA_PALLAS_NORM=1.
_PALLAS_NORM = os.environ.get("OMNIMAMBA_PALLAS_NORM", "0") == "1"


def _pallas_worthwhile(x) -> bool:
    """Kernel-dispatch guard: the Pallas path wins on big training/prefill
    activations; the one-token decode step ((B, d) rows) is latency-bound
    where a separate kernel launch loses to XLA's inline fusion."""
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return rows >= 256


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm with fp32 statistics; output in x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array], eps: float = 1e-5
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def add_norm(
    x: jax.Array,
    residual: Optional[jax.Array],
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
    is_rms: bool = True,
    residual_in_fp32: bool = True,
    prenorm: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Fused add + (RMS|Layer)Norm, matching Triton ``layer_norm_fn`` semantics
    (reference block.py:86-95: returns (normed, new_residual) when prenorm).

    new_residual = x + residual (fp32 if residual_in_fp32)
    normed       = Norm(new_residual) in x.dtype
    """
    if (
        _PALLAS_NORM
        and is_rms
        and prenorm
        and residual_in_fp32
        and bias is None
        and x.ndim >= 2
        and _pallas_worthwhile(x)
    ):
        from omnimamba_tpu.ops.norms_pallas import fused_add_rms_norm

        return fused_add_rms_norm(x, residual, weight, eps)
    res_dtype = jnp.float32 if residual_in_fp32 else x.dtype
    new_residual = x.astype(res_dtype) if residual is None else (
        x.astype(res_dtype) + residual.astype(res_dtype)
    )
    if is_rms:
        normed = rms_norm(new_residual, weight, eps).astype(x.dtype)
    else:
        normed = layer_norm(new_residual, weight, bias, eps).astype(x.dtype)
    if prenorm:
        return normed, new_residual
    return normed, None


def gated_rms_norm(
    y: jax.Array, z: jax.Array, weight: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Mamba-2's RMSNormGated with norm_before_gate=False:
    out = RMSNorm(y * silu(z)) * weight.

    This matches mamba_ssm's ``RMSNormGated`` as used inside ``Mamba2.forward``
    (external dep of reference; SURVEY §2.3 row 1).
    """
    if _PALLAS_NORM and y.ndim >= 2 and y.shape == z.shape and _pallas_worthwhile(y):
        from omnimamba_tpu.ops.norms_pallas import fused_gated_rms_norm

        return fused_gated_rms_norm(y, z, weight, eps)
    yf = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    var = jnp.mean(yf * yf, axis=-1, keepdims=True)
    out = yf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(y.dtype)
