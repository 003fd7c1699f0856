"""Short causal depthwise conv1d — the TPU replacement for ``causal_conv1d``.

The reference depends on the CUDA ``causal-conv1d==1.4.0`` package
(requirements.txt:12; SURVEY §2.3 row 3) for a width-4 depthwise causal conv
with SiLU, plus its 1-token ``causal_conv1d_update`` shift-register step for
decode. Here both are expressed directly in XLA: the full-sequence form is a
tiny stack of shifted adds (XLA fuses it into the surrounding elementwise
work; a dedicated kernel would be memory-bound anyway), and the decode step
updates a ``(batch, width, channels)`` rolling state.

Layout note: channels live on the last (lane) axis — TPU-friendly, unlike the
reference's (batch, channels, length).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jax.Array,  # (B, L, C)
    weight: jax.Array,  # (W, C) depthwise taps, tap 0 = oldest
    bias: Optional[jax.Array] = None,  # (C,)
    *,
    activation: str = "silu",
    initial_state: Optional[jax.Array] = None,  # (B, W-1, C) left context
) -> jax.Array:
    """y[t] = act(sum_k w[k] * x[t - (W-1) + k] + b), causal (left) padding.

    ``initial_state`` supplies the W-1 tokens of left context (used when
    continuing a sequence from a cached conv state); defaults to zeros,
    matching the reference's fresh-prefill behaviour.
    """
    B, L, C = x.shape
    W = weight.shape[0]
    if initial_state is None:
        pad = jnp.zeros((B, W - 1, C), dtype=x.dtype)
    else:
        pad = initial_state.astype(x.dtype)
    xp = jnp.concatenate([pad, x], axis=1)  # (B, L+W-1, C)
    y = jnp.zeros((B, L, C), dtype=jnp.float32)
    for k in range(W):
        y = y + xp[:, k : k + L, :].astype(jnp.float32) * weight[k].astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "silu":
        y = jax.nn.silu(y)
    elif activation is not None and activation != "none":
        raise ValueError(f"unsupported activation {activation}")
    return y.astype(x.dtype)


def conv_state_from_sequence(
    x: jax.Array, width: int, initial_state: Optional[jax.Array] = None
) -> jax.Array:
    """Final rolling conv state after consuming x: last (width-1) inputs.

    Returned shape (B, width-1, C) so a following ``causal_conv1d`` or
    ``causal_conv1d_step`` continues seamlessly. Handles L < width-1 by
    pulling the remainder from ``initial_state`` (zeros by default).
    """
    B, L, C = x.shape
    keep = width - 1
    if initial_state is None:
        initial_state = jnp.zeros((B, keep, C), dtype=x.dtype)
    full = jnp.concatenate([initial_state, x], axis=1)
    return full[:, -keep:, :]


def causal_conv1d_step(
    x_t: jax.Array,  # (B, C) new token
    conv_state: jax.Array,  # (B, W-1, C) previous inputs (oldest first)
    weight: jax.Array,  # (W, C)
    bias: Optional[jax.Array] = None,
    *,
    activation: str = "silu",
) -> Tuple[jax.Array, jax.Array]:
    """O(1) decode-step equivalent of ``causal_conv1d_update``.

    Returns (y_t, new_conv_state).
    """
    W = weight.shape[0]
    window = jnp.concatenate([conv_state, x_t[:, None, :]], axis=1)  # (B, W, C)
    y = jnp.sum(window.astype(jnp.float32) * weight.astype(jnp.float32)[None], axis=1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "silu":
        y = jax.nn.silu(y)
    new_state = window[:, 1:, :]
    return y.astype(x_t.dtype), new_state
