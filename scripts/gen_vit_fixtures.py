"""Generate ViT parity fixtures: an independent torch implementation of the
timm VisionTransformer graph (the reference's featurizers,
``/root/reference/models/cobra/backbones/vision/dinosiglip_vit.py:43-53``)
with seeded random weights, recorded through the exact feature contract the
reference uses — ``get_intermediate_layers(n={depth-2})``, prefix tokens
stripped, no final norm (``base_vision.py:138-143``).

The emitted npz holds a timm-style state dict + input + expected features
for a dino-like (cls + reg tokens, LayerScale, no_embed_class, exact GELU)
and a siglip-like (no prefix tokens, tanh GELU) geometry. The JAX side must
reproduce the features after ``utils.convert.convert_timm_vit`` to <=1e-4
(fp32) — validating both the ViT forward numerics and the converter.

Run from repo root: python scripts/gen_vit_fixtures.py
(timm itself is not installable here; this mirrors the timm graph per its
published architecture: patch conv -> _pos_embed -> pre-norm blocks with
fused qkv, optional LayerScale -> final norm.)
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn


class TimmAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        B, T, D = x.shape
        qkv = self.qkv(x).reshape(B, T, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # (3, B, H, T, hd)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, T, D)
        return self.proj(x)


class LayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class TimmBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, layerscale, tanh_gelu):
        super().__init__()
        hidden = int(round(dim * mlp_ratio))
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TimmAttention(dim, num_heads)
        self.ls1 = LayerScale(dim) if layerscale else nn.Identity()
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        act = nn.GELU(approximate="tanh") if tanh_gelu else nn.GELU()
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.act = act
        self.mlp.fc2 = nn.Linear(hidden, dim)
        self.ls2 = LayerScale(dim) if layerscale else nn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        h = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2(h)


class TimmViT(nn.Module):
    """timm VisionTransformer, eval path only, with the pieces the two
    OmniMamba featurizers exercise."""

    def __init__(
        self,
        img_size,
        patch_size,
        dim,
        depth,
        num_heads,
        *,
        class_token,
        reg_tokens,
        no_embed_class,
        layerscale,
        tanh_gelu,
        mlp_ratio=4.0,
    ):
        super().__init__()
        self.no_embed_class = no_embed_class
        grid = img_size // patch_size
        self.num_patches = grid * grid
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        self.cls_token = (
            nn.Parameter(torch.zeros(1, 1, dim)) if class_token else None
        )
        self.reg_token = (
            nn.Parameter(torch.zeros(1, reg_tokens, dim)) if reg_tokens else None
        )
        n_pos = self.num_patches if no_embed_class else self.num_patches + int(class_token)
        self.pos_embed = nn.Parameter(torch.zeros(1, n_pos, dim))
        self.blocks = nn.ModuleList(
            TimmBlock(dim, num_heads, mlp_ratio, layerscale, tanh_gelu)
            for _ in range(depth)
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.num_prefix_tokens = int(class_token) + reg_tokens

    def _pos_embed(self, x):
        # timm VisionTransformer._pos_embed
        to_cat = []
        if self.cls_token is not None:
            to_cat.append(self.cls_token.expand(x.shape[0], -1, -1))
        if self.reg_token is not None:
            to_cat.append(self.reg_token.expand(x.shape[0], -1, -1))
        if self.no_embed_class:
            x = x + self.pos_embed
            if to_cat:
                x = torch.cat(to_cat + [x], dim=1)
        else:
            if to_cat:
                x = torch.cat(to_cat + [x], dim=1)
            x = x + self.pos_embed
        return x

    @torch.no_grad()
    def get_intermediate_features(self, pixels_nchw):
        """get_intermediate_layers(n={depth-2}) semantics: output of block
        index depth-2 (i.e. all but the last block), prefix stripped, no
        final norm."""
        x = self.patch_embed.proj(pixels_nchw)  # (B, D, g, g)
        x = x.flatten(2).transpose(1, 2)  # (B, P, D)
        x = self._pos_embed(x)
        take = len(self.blocks) - 2
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i == take:
                break
        return x[:, self.num_prefix_tokens :]


def seed_weights(model: nn.Module, seed: int):
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def generate_fixture() -> dict:
    """Deterministic in-memory fixture: {pixels_nhwc, <name>_features,
    <name>_sd/<timm key>} for the dino-like and siglip-like variants."""
    out = {}
    B, S, PATCH, DIM, DEPTH, HEADS = 2, 56, 14, 64, 4, 4
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    out["pixels_nhwc"] = pixels

    variants = {
        "dino": dict(
            class_token=True, reg_tokens=4, no_embed_class=True,
            layerscale=True, tanh_gelu=False,
        ),
        "siglip": dict(
            class_token=False, reg_tokens=0, no_embed_class=False,
            layerscale=False, tanh_gelu=True,
        ),
    }
    seeds = {"dino": 1234, "siglip": 5678}
    for name, kw in variants.items():
        m = TimmViT(S, PATCH, DIM, DEPTH, HEADS, **kw).eval()
        seed_weights(m, seed=seeds[name])
        feats = m.get_intermediate_features(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).numpy()
        out[f"{name}_features"] = feats
        for k, v in m.state_dict().items():
            out[f"{name}_sd/{k}"] = v.numpy()
    return out


def main():
    out = generate_fixture()
    for name in ("dino", "siglip"):
        f = out[f"{name}_features"]
        print(name, "features", f.shape, "std", f.std())
    path = os.path.join("tests", "fixtures", "vit_parity.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, f"({os.path.getsize(path)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
