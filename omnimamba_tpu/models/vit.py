"""Vision transformers in JAX: DINOv2-L/14-reg4 + SigLIP-SO400M/14 @ 384px.

Reference: ``models/cobra/backbones/vision/dinosiglip_vit.py`` — two timm
ViTs whose forward is monkey-patched to return the *second-to-last* block's
patch tokens (``base_vision.py:138-143``: ``get_intermediate_layers`` with
``n={len(blocks)-2}``, no final norm, prefix tokens stripped), concatenated
to (B, 729, 2176) features (``dinosiglip_vit.py:138-143``).

One generic implementation covers both geometries via ``ViTConfig``:
- DINOv2: cls token + 4 register tokens, pos-embed on patches only
  (``no_embed_class``), LayerScale, exact GELU
- SigLIP: no prefix tokens, pos-embed on patches, tanh GELU

TPU-first notes: patchify is a stride-14 conv (one big MXU matmul),
attention uses fp32 softmax, everything jits into a single program per
backbone. Weight conversion from timm checkpoints lives in utils/convert.py.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import ViTConfig, VisionConfig
from omnimamba_tpu.ops.norms import layer_norm


def _linear(key, d_in, d_out, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(d_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (d_in, d_out), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (d_out,), dtype, -bound, bound),
    }


def _apply_linear(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def init_vit(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.depth))
    d = cfg.width
    mlp_hidden = int(round(d * cfg.mlp_ratio))
    p: Dict = {
        "patch_embed": {
            "kernel": 0.02
            * jax.random.normal(next(ks), (cfg.patch_size, cfg.patch_size, 3, d)).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "pos_embed": 0.02
        * jax.random.normal(next(ks), (1, cfg.num_patches, d)).astype(dtype),
    }
    if cfg.use_cls_token:
        p["cls_token"] = jnp.zeros((1, 1, d), dtype)
    if cfg.num_reg_tokens:
        p["reg_tokens"] = jnp.zeros((1, cfg.num_reg_tokens, d), dtype)
    blocks = []
    for _ in range(cfg.depth):
        blk = {
            "norm1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "attn": {
                "qkv": _linear(next(ks), d, 3 * d, dtype),
                "proj": _linear(next(ks), d, d, dtype),
            },
            "norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "mlp": {
                "fc1": _linear(next(ks), d, mlp_hidden, dtype),
                "fc2": _linear(next(ks), mlp_hidden, d, dtype),
            },
        }
        if cfg.layerscale:
            blk["ls1"] = {"gamma": 1e-5 * jnp.ones((d,), dtype)}
            blk["ls2"] = {"gamma": 1e-5 * jnp.ones((d,), dtype)}
        blocks.append(blk)
    p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    p["norm"] = {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
    return p


def _attention(p: Dict, x: jax.Array, num_heads: int) -> jax.Array:
    B, T, D = x.shape
    hd = D // num_heads
    qkv = _apply_linear(p["qkv"], x).reshape(B, T, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,T,H,hd)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores * (hd ** -0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, T, D)
    return _apply_linear(p["proj"], out)


def _block(blk: Dict, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    h = layer_norm(x, blk["norm1"]["scale"], blk["norm1"]["bias"], cfg.norm_eps)
    h = _attention(blk["attn"], h, cfg.num_heads)
    if "ls1" in blk:
        h = h * blk["ls1"]["gamma"].astype(h.dtype)
    x = x + h
    h = layer_norm(x, blk["norm2"]["scale"], blk["norm2"]["bias"], cfg.norm_eps)
    h = _apply_linear(blk["mlp"]["fc1"], h)
    h = jax.nn.gelu(h, approximate=_use_tanh_gelu(cfg))
    h = _apply_linear(blk["mlp"]["fc2"], h)
    if "ls2" in blk:
        h = h * blk["ls2"]["gamma"].astype(h.dtype)
    return x + h


def _use_tanh_gelu(cfg: ViTConfig) -> bool:
    # SigLIP uses tanh-approximate GELU; DINOv2 uses exact
    return not cfg.use_cls_token


def vit_features(
    params: Dict,
    pixels: jax.Array,  # (B, H, W, 3) normalized
    cfg: ViTConfig,
    *,
    out_offset: int = 2,  # take the output of block depth-out_offset (timm n={len-2})
    remat: bool = False,
) -> jax.Array:
    """Patch-token features from the (depth - out_offset)-th block, prefix
    tokens stripped, no final norm — exactly the reference's featurizer
    contract (base_vision.py:138-143)."""
    B = pixels.shape[0]
    d = cfg.width
    x = jax.lax.conv_general_dilated(
        pixels,
        params["patch_embed"]["kernel"].astype(pixels.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    x = (x + params["patch_embed"]["bias"].astype(jnp.float32)).astype(pixels.dtype)
    x = x.reshape(B, cfg.num_patches, d)
    x = x + params["pos_embed"].astype(x.dtype)

    n_prefix = 0
    prefix = []
    if cfg.use_cls_token:
        prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, d)).astype(x.dtype))
        n_prefix += 1
    if cfg.num_reg_tokens:
        prefix.append(
            jnp.broadcast_to(
                params["reg_tokens"], (B, cfg.num_reg_tokens, d)
            ).astype(x.dtype)
        )
        n_prefix += cfg.num_reg_tokens
    if prefix:
        x = jnp.concatenate(prefix + [x], axis=1)

    n_run = cfg.depth - out_offset + 1  # run blocks 0..depth-out_offset
    # blocks are stacked; slice the prefix we need and scan
    blocks = jax.tree.map(lambda a: a[:n_run], params["blocks"])

    def body(h, blk):
        return _block(blk, h, cfg), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, blocks)
    return x[:, n_prefix:]


def dinosiglip_features(
    dino_params: Dict,
    siglip_params: Dict,
    pixels: Dict[str, jax.Array],  # {"dino": (B,H,W,3), "siglip": (B,H,W,3)}
    cfg: VisionConfig,
    remat: bool = False,
) -> jax.Array:
    """Concatenated (B, 729, 2176) features (dinosiglip_vit.py:138-143)."""
    dino = vit_features(dino_params, pixels["dino"], cfg.dino, remat=remat)
    sig = vit_features(siglip_params, pixels["siglip"], cfg.siglip, remat=remat)
    return jnp.concatenate([dino, sig], axis=-1)
