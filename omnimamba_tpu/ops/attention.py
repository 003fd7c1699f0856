"""Causal multi-head attention mixer — the dormant ``attn_layer_idx`` option.

Reference: ``mamba_ssm.modules.mha.MHA`` selected when a layer index is in
``attn_layer_idx`` (``mixer_seq_simple.py:194-207``; empty in every shipped
config, config_mamba.py:17 — implemented here for config-surface parity).

Full-sequence form is plain causal SDPA (XLA fuses this fine at 1.3B scale;
a Pallas flash kernel is unnecessary until much longer contexts). Decode
keeps a fixed-capacity KV cache — unlike the SSM layers this is O(L) state,
which is exactly why the reference never enables it (SURVEY §5.7).

Optional rotary embeddings (``rotary_emb_dim``) use the GPT-NeoX
interleaved-half convention, matching mamba_ssm's default.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class MHACache(NamedTuple):
    k: jax.Array  # (B, max_len, H, hd)
    v: jax.Array  # (B, max_len, H, hd)
    pos: jax.Array  # scalar int32: filled length


def init_mha(key: jax.Array, d_model: int, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_model)
    return {
        "qkv": {
            "kernel": jax.random.uniform(k1, (d_model, 3 * d_model), dtype, -bound, bound),
            "bias": jnp.zeros((3 * d_model,), dtype),
        },
        "out": {
            "kernel": jax.random.uniform(k2, (d_model, d_model), dtype, -bound, bound),
            "bias": jnp.zeros((d_model,), dtype),
        },
    }


def _rope(x: jax.Array, positions: jax.Array, rotary_dim: int, base: float = 10000.0):
    """Rotate the first rotary_dim dims of each head (half-split convention)."""
    if rotary_dim <= 0:
        return x
    half = rotary_dim // 2
    freqs = jnp.exp(-jnp.arange(0, half, dtype=jnp.float32) * (math.log(base) / half))
    ang = positions.astype(jnp.float32)[..., None] * freqs  # (..., half)
    cos = jnp.cos(ang)[..., None, :]
    sin = jnp.sin(ang)[..., None, :]
    x1 = x[..., :half]
    x2 = x[..., half:rotary_dim]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return jnp.concatenate([rot.astype(x.dtype), x[..., rotary_dim:]], axis=-1)


def mha_forward(
    params: Dict,
    x: jax.Array,  # (B, L, d)
    num_heads: int,
    *,
    rotary_dim: int = 0,
    return_cache: bool = False,
    max_len: Optional[int] = None,
) -> Tuple[jax.Array, Optional[MHACache]]:
    B, L, D = x.shape
    hd = D // num_heads
    qkv = x @ params["qkv"]["kernel"].astype(x.dtype) + params["qkv"]["bias"].astype(x.dtype)
    q, k, v = jnp.split(qkv.reshape(B, L, 3, num_heads, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, L, H, hd)
    pos = jnp.arange(L)
    q = _rope(q, pos[None, :], rotary_dim)
    k = _rope(k, pos[None, :], rotary_dim)

    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd**-0.5)
    mask = jnp.tril(jnp.ones((L, L), bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, L, D)
    y = out @ params["out"]["kernel"].astype(x.dtype) + params["out"]["bias"].astype(x.dtype)

    cache = None
    if return_cache:
        assert max_len is not None and max_len >= L
        kbuf = jnp.zeros((B, max_len, num_heads, hd), x.dtype).at[:, :L].set(k)
        vbuf = jnp.zeros((B, max_len, num_heads, hd), x.dtype).at[:, :L].set(v)
        cache = MHACache(k=kbuf, v=vbuf, pos=jnp.int32(L))
    return y, cache


def mha_step(
    params: Dict,
    x_t: jax.Array,  # (B, d)
    cache: MHACache,
    num_heads: int,
    *,
    rotary_dim: int = 0,
) -> Tuple[jax.Array, MHACache]:
    B, D = x_t.shape
    hd = D // num_heads
    qkv = x_t @ params["qkv"]["kernel"].astype(x_t.dtype) + params["qkv"]["bias"].astype(x_t.dtype)
    q, k, v = jnp.split(qkv.reshape(B, 3, num_heads, hd), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]  # (B, H, hd)
    q = _rope(q, cache.pos[None], rotary_dim)
    k = _rope(k, cache.pos[None], rotary_dim)

    kbuf = jax.lax.dynamic_update_slice(cache.k, k[:, None], (0, cache.pos, 0, 0))
    vbuf = jax.lax.dynamic_update_slice(cache.v, v[:, None], (0, cache.pos, 0, 0))
    T = kbuf.shape[1]
    scores = jnp.einsum("bhd,bshd->bhs", q, kbuf, preferred_element_type=jnp.float32)
    scores = scores * (hd**-0.5)
    valid = jnp.arange(T)[None, None, :] <= cache.pos
    scores = jnp.where(valid, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhs,bshd->bhd", attn.astype(x_t.dtype), vbuf,
                     preferred_element_type=jnp.float32)
    out = out.astype(x_t.dtype).reshape(B, D)
    y = out @ params["out"]["kernel"].astype(x_t.dtype) + params["out"]["bias"].astype(x_t.dtype)
    return y, MHACache(k=kbuf, v=vbuf, pos=cache.pos + 1)


def init_gated_mlp(key: jax.Array, d_model: int, hidden: int, dtype=jnp.float32) -> Dict:
    """mamba_ssm GatedMLP: fc1 d -> 2*hidden, y * silu(gate), fc2 -> d."""
    k1, k2 = jax.random.split(key)
    b1 = 1.0 / math.sqrt(d_model)
    b2 = 1.0 / math.sqrt(hidden)
    return {
        "fc1": {"kernel": jax.random.uniform(k1, (d_model, 2 * hidden), dtype, -b1, b1)},
        "fc2": {"kernel": jax.random.uniform(k2, (hidden, d_model), dtype, -b2, b2)},
    }


def gated_mlp(params: Dict, x: jax.Array) -> jax.Array:
    h = x @ params["fc1"]["kernel"].astype(x.dtype)
    y, gate = jnp.split(h, 2, axis=-1)
    h = y * jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
    return h @ params["fc2"]["kernel"].astype(x.dtype)
