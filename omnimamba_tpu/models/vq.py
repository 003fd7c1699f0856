"""LlamaGen VQ-16 image tokenizer in JAX — encoder, l2-normalized codebook,
decoder.

Reference: ``llamagen_tokenizer/tokenizer_image/vq_model.py`` (the one live
file of the vendored LlamaGen tree, imported at ``models/mamba_vlm.py:13``):

- Encoder (:64-124): conv_in -> 5 levels x [2 ResnetBlocks (+Attn at last
  level)] with stride-2 downsample between levels -> mid Res/Attn/Res ->
  GroupNorm/swish/conv_out (256 z-channels). f16 total downsample.
- VectorQuantizer (:197-276): 16384 x 8 codebook, l2-normalized lookup,
  straight-through estimator, vq/commit/entropy losses.
- Decoder (:128-194): mirror with 3 ResnetBlocks per level and nearest-x2
  upsampling; ``decode_code`` (:52-55) turns 256 token ids into a 256px image
  (z_shape [B, 8, 16, 16], mamba_vlm.py:104-108).

TPU-first re-design: NHWC layout throughout (channels on the lane axis),
conv kernels HWIO, GroupNorm statistics in fp32, the nearest-neighbour
codebook match as one (BHW, 8) x (8, 16384) matmul + argmax on the MXU.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import VQConfig


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """torch Conv2d default: U(±1/sqrt(fan_in)), fan_in = cin*kh*kw."""
    bound = 1.0 / math.sqrt(cin * kh * kw)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def conv2d(p: Dict, x: jax.Array, *, stride: int = 1, padding="SAME") -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def group_norm(p: Dict, x: jax.Array, groups: int = 32, eps: float = 1e-6) -> jax.Array:
    B, H, W, C = x.shape
    groups = min(groups, C)
    assert C % groups == 0
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(
        x.dtype
    )


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _gn_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _init_resnet_block(key, cin, cout, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(ks[2], 1, 1, cin, cout, dtype)
    return p


def resnet_block(p: Dict, x: jax.Array) -> jax.Array:
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def _init_attn_block(key, c, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c, dtype),
        "q": _conv_init(ks[0], 1, 1, c, c, dtype),
        "k": _conv_init(ks[1], 1, 1, c, c, dtype),
        "v": _conv_init(ks[2], 1, 1, c, c, dtype),
        "proj_out": _conv_init(ks[3], 1, 1, c, c, dtype),
    }


def attn_block(p: Dict, x: jax.Array) -> jax.Array:
    """Single-head full self-attention over spatial positions
    (vq_model.py:317-351)."""
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x)
    q = conv2d(p["q"], h).reshape(B, H * W, C)
    k = conv2d(p["k"], h).reshape(B, H * W, C)
    v = conv2d(p["v"], h).reshape(B, H * W, C)
    scores = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores * (C ** -0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bij,bjc->bic", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, H, W, C)
    return x + conv2d(p["proj_out"], out)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def init_encoder(key, cfg: VQConfig, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 64))
    ch = cfg.ch
    p: Dict = {"conv_in": _conv_init(next(ks), 3, 3, 3, ch, dtype)}
    in_mult = (1,) + tuple(cfg.encoder_ch_mult)
    levels = []
    n_lv = len(cfg.encoder_ch_mult)
    for i in range(n_lv):
        cin, cout = ch * in_mult[i], ch * cfg.encoder_ch_mult[i]
        lvl = {"res": [], "attn": []}
        c = cin
        for _ in range(cfg.num_res_blocks):
            lvl["res"].append(_init_resnet_block(next(ks), c, cout, dtype))
            c = cout
            if i == n_lv - 1:
                lvl["attn"].append(_init_attn_block(next(ks), c, dtype))
        if i != n_lv - 1:
            lvl["downsample"] = _conv_init(next(ks), 3, 3, c, c, dtype)
        levels.append(lvl)
    p["levels"] = levels
    cmid = ch * cfg.encoder_ch_mult[-1]
    p["mid"] = {
        "res1": _init_resnet_block(next(ks), cmid, cmid, dtype),
        "attn": _init_attn_block(next(ks), cmid, dtype),
        "res2": _init_resnet_block(next(ks), cmid, cmid, dtype),
    }
    p["norm_out"] = _gn_init(cmid, dtype)
    p["conv_out"] = _conv_init(next(ks), 3, 3, cmid, cfg.z_channels, dtype)
    return p


def encoder_forward(p: Dict, x: jax.Array, cfg: VQConfig) -> jax.Array:
    h = conv2d(p["conv_in"], x)
    n_lv = len(cfg.encoder_ch_mult)
    for i, lvl in enumerate(p["levels"]):
        for j in range(cfg.num_res_blocks):
            h = resnet_block(lvl["res"][j], h)
            if lvl["attn"]:
                h = attn_block(lvl["attn"][j], h)
        if i != n_lv - 1:
            # asymmetric (0,1,0,1) pad + stride-2 conv (vq_model.py:381-396)
            hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(lvl["downsample"], hp, stride=2, padding="VALID")
    h = resnet_block(p["mid"]["res1"], h)
    h = attn_block(p["mid"]["attn"], h)
    h = resnet_block(p["mid"]["res2"], h)
    h = conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))
    return h


def init_decoder(key, cfg: VQConfig, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 64))
    ch = cfg.ch
    n_lv = len(cfg.decoder_ch_mult)
    block_in = ch * cfg.decoder_ch_mult[-1]
    p: Dict = {"conv_in": _conv_init(next(ks), 3, 3, cfg.z_channels, block_in, dtype)}
    p["mid"] = {
        "res1": _init_resnet_block(next(ks), block_in, block_in, dtype),
        "attn": _init_attn_block(next(ks), block_in, dtype),
        "res2": _init_resnet_block(next(ks), block_in, block_in, dtype),
    }
    levels = []
    c = block_in
    for i_level in reversed(range(n_lv)):
        cout = ch * cfg.decoder_ch_mult[i_level]
        lvl = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            lvl["res"].append(_init_resnet_block(next(ks), c, cout, dtype))
            c = cout
            if i_level == n_lv - 1:
                lvl["attn"].append(_init_attn_block(next(ks), c, dtype))
        if i_level != 0:
            lvl["upsample"] = _conv_init(next(ks), 3, 3, c, c, dtype)
        levels.append(lvl)
    p["levels"] = levels
    p["norm_out"] = _gn_init(c, dtype)
    p["conv_out"] = _conv_init(next(ks), 3, 3, c, 3, dtype)
    return p


def decoder_forward(p: Dict, z: jax.Array, cfg: VQConfig) -> jax.Array:
    h = conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["res1"], h)
    h = attn_block(p["mid"]["attn"], h)
    h = resnet_block(p["mid"]["res2"], h)
    n_stage = len(p["levels"])
    for s, lvl in enumerate(p["levels"]):
        for j in range(cfg.num_res_blocks + 1):
            h = resnet_block(lvl["res"][j], h)
            if lvl["attn"]:
                h = attn_block(lvl["attn"][j], h)
        if s != n_stage - 1:
            # nearest x2 upsample + conv (vq_model.py:367-378)
            B, H, W, C = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv2d(lvl["upsample"], h)
    h = conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))
    return h


# ---------------------------------------------------------------------------
# quantizer + full model
# ---------------------------------------------------------------------------


class VQEncodeOutput(NamedTuple):
    quant: jax.Array  # (B, h, w, e_dim) straight-through quantized latents
    indices: jax.Array  # (B, h, w) int32 codebook ids
    vq_loss: jax.Array
    commit_loss: jax.Array
    entropy_loss: jax.Array


def init_vq(key, cfg: VQConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 5)
    codebook = jax.random.uniform(
        ks[0],
        (cfg.codebook_size, cfg.codebook_embed_dim),
        dtype,
        -1.0 / cfg.codebook_size,
        1.0 / cfg.codebook_size,
    )
    if cfg.codebook_l2_norm:
        codebook = codebook / jnp.linalg.norm(codebook, axis=-1, keepdims=True)
    return {
        "encoder": init_encoder(ks[1], cfg, dtype),
        "decoder": init_decoder(ks[2], cfg, dtype),
        "quant_conv": _conv_init(ks[3], 1, 1, cfg.z_channels, cfg.codebook_embed_dim, dtype),
        "post_quant_conv": _conv_init(
            ks[4], 1, 1, cfg.codebook_embed_dim, cfg.z_channels, dtype
        ),
        "codebook": codebook,
    }


def _normalized_codebook(params: Dict, cfg: VQConfig) -> jax.Array:
    cb = params["codebook"].astype(jnp.float32)
    if cfg.codebook_l2_norm:
        cb = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True)
    return cb


def quantize(
    params: Dict, z: jax.Array, cfg: VQConfig, training: bool = False
) -> VQEncodeOutput:
    """Nearest-codebook lookup with straight-through gradients
    (vq_model.py:215-259). With l2 norm, argmin distance == argmax dot."""
    B, H, W, E = z.shape
    zf = z.astype(jnp.float32)
    if cfg.codebook_l2_norm:
        zf = zf / jnp.linalg.norm(zf, axis=-1, keepdims=True)
    cb = _normalized_codebook(params, cfg)
    sim = jnp.einsum("bhwe,ve->bhwv", zf, cb, preferred_element_type=jnp.float32)
    indices = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    z_q = cb[indices]

    vq_loss = commit_loss = entropy_loss = jnp.float32(0.0)
    if training:
        vq_loss = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(zf)))
        commit_loss = cfg.commit_loss_beta * jnp.mean(
            jnp.square(jax.lax.stop_gradient(z_q) - zf)
        )
        if cfg.entropy_loss_ratio > 0:
            d = sim.reshape(-1, cfg.codebook_size) / 0.01
            probs = jax.nn.softmax(d, axis=-1)
            log_probs = jax.nn.log_softmax(d + 1e-5, axis=-1)
            avg_probs = jnp.mean(probs, axis=0)
            avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
            sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
            entropy_loss = cfg.entropy_loss_ratio * (sample_entropy - avg_entropy)

    # straight-through: gradients flow to z (pre-normalization z, as in ref)
    z_q_st = zf + jax.lax.stop_gradient(z_q - zf)
    return VQEncodeOutput(
        quant=z_q_st.astype(z.dtype),
        indices=indices,
        vq_loss=vq_loss,
        commit_loss=commit_loss,
        entropy_loss=entropy_loss,
    )


def vq_encode(
    params: Dict, img: jax.Array, cfg: VQConfig, training: bool = False
) -> VQEncodeOutput:
    """img: (B, H, W, 3) in [-1, 1] -> token grid (B, H/16, W/16)."""
    h = encoder_forward(params["encoder"], img, cfg)
    h = conv2d(params["quant_conv"], h)
    return quantize(params, h, cfg, training)


def vq_decode(params: Dict, quant: jax.Array, cfg: VQConfig) -> jax.Array:
    h = conv2d(params["post_quant_conv"], quant)
    return decoder_forward(params["decoder"], h, cfg)


def vq_decode_code(
    params: Dict, indices: jax.Array, cfg: VQConfig, grid: Optional[Tuple[int, int]] = None
) -> jax.Array:
    """Token ids -> image (decode_code, vq_model.py:52-55 + get_codebook_entry).

    indices: (B, T) or (B, h, w); grid defaults to sqrt(T) x sqrt(T)
    (z_shape [B, 8, 16, 16] for 256 tokens, mamba_vlm.py:104-108).
    """
    if indices.ndim == 2:
        B, T = indices.shape
        if grid is None:
            g = int(math.isqrt(T))
            assert g * g == T
            grid = (g, g)
        indices = indices.reshape(B, *grid)
    cb = _normalized_codebook(params, cfg)
    z_q = cb[indices].astype(params["quant_conv"]["kernel"].dtype)
    return vq_decode(params, z_q, cfg)
