"""ViT forward geometry + timm-checkpoint conversion structure."""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.config import ViTConfig
from omnimamba_tpu.models.vit import init_vit, vit_features
from omnimamba_tpu.utils.convert import convert_timm_vit


def tiny_vit(reg=True):
    return ViTConfig(
        img_size=28, patch_size=14, width=32, depth=3, num_heads=2,
        num_reg_tokens=4 if reg else 0, use_cls_token=reg, layerscale=reg,
    )


def timm_style_sd(cfg: ViTConfig, rng, embed_class_pos=False):
    d = cfg.width
    hid = int(round(d * cfg.mlp_ratio))
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(d, 3, cfg.patch_size, cfg.patch_size)),
        "patch_embed.proj.bias": rng.normal(size=(d,)),
        "pos_embed": rng.normal(
            size=(1, cfg.num_patches + (1 if embed_class_pos else 0), d)
        ),
        "norm.weight": rng.normal(size=(d,)),
        "norm.bias": rng.normal(size=(d,)),
    }
    if cfg.use_cls_token:
        sd["cls_token"] = rng.normal(size=(1, 1, d))
    if cfg.num_reg_tokens:
        sd["reg_token"] = rng.normal(size=(1, cfg.num_reg_tokens, d))
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = rng.normal(size=(d,))
        sd[f"{b}.norm1.bias"] = rng.normal(size=(d,))
        sd[f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * d, d))
        sd[f"{b}.attn.qkv.bias"] = rng.normal(size=(3 * d,))
        sd[f"{b}.attn.proj.weight"] = rng.normal(size=(d, d))
        sd[f"{b}.attn.proj.bias"] = rng.normal(size=(d,))
        sd[f"{b}.norm2.weight"] = rng.normal(size=(d,))
        sd[f"{b}.norm2.bias"] = rng.normal(size=(d,))
        sd[f"{b}.mlp.fc1.weight"] = rng.normal(size=(hid, d))
        sd[f"{b}.mlp.fc1.bias"] = rng.normal(size=(hid,))
        sd[f"{b}.mlp.fc2.weight"] = rng.normal(size=(d, hid))
        sd[f"{b}.mlp.fc2.bias"] = rng.normal(size=(d,))
        if cfg.layerscale:
            sd[f"{b}.ls1.gamma"] = rng.normal(size=(d,))
            sd[f"{b}.ls2.gamma"] = rng.normal(size=(d,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_vit_features_shapes():
    for reg in (True, False):
        cfg = tiny_vit(reg)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        feats = vit_features(params, x, cfg)
        assert feats.shape == (2, cfg.num_patches, cfg.width)


def test_timm_conversion_structure():
    for reg, embed_class in ((True, False), (False, True)):
        cfg = tiny_vit(reg)
        sd = timm_style_sd(cfg, np.random.default_rng(0), embed_class_pos=embed_class)
        params = convert_timm_vit(sd, cfg)
        ref = jax.tree.map(lambda x: tuple(x.shape), init_vit(jax.random.PRNGKey(0), cfg))
        got = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
        assert ref == got
        # converted weights run
        x = jnp.ones((1, 28, 28, 3))
        feats = vit_features(jax.tree.map(jnp.asarray, params), x, cfg)
        assert feats.shape == (1, cfg.num_patches, cfg.width)
