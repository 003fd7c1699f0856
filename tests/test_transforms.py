"""Resize-strategy parity tests (VERDICT round-1 item 4/6).

Covers the three reference strategies (base_vision.py:169-196):
resize-naive, resize-crop (shorter-side resize + center crop), and
letterbox (mean-fill pad to square). Host (PIL-exact) and device (jit)
paths must agree on geometry; the host path is the
torchvision-semantics-matching one.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import ViTConfig
from omnimamba_tpu.data.transforms import (
    _center_crop_offsets,
    _shorter_side_shape,
    host_vit_transform,
    vit_transform,
)

CFG = ViTConfig(img_size=28, patch_size=14, width=32, depth=2, num_heads=2)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_shorter_side_shape_torchvision_semantics():
    # torchvision: shorter -> target, longer scaled with int() truncation
    assert _shorter_side_shape(100, 200, 50) == (50, 100)
    assert _shorter_side_shape(200, 100, 50) == (100, 50)
    assert _shorter_side_shape(99, 100, 50) == (50, int(50 * 100 / 99))
    assert _center_crop_offsets(100, 60, 50) == (25, 5)
    # rounding: (51-50)/2 = 0.5 -> round-half-even = 0
    assert _center_crop_offsets(51, 50, 50) == (0, 0)


@pytest.mark.parametrize("strategy", ["resize-naive", "resize-crop", "letterbox"])
@pytest.mark.parametrize("hw", [(64, 64), (48, 96), (96, 48)])
def test_shapes_and_host_device_agreement(strategy, hw):
    img = _img(*hw)
    host = host_vit_transform(img, CFG, strategy)
    assert host.shape == (28, 28, 3)
    dev = np.asarray(vit_transform(jnp.asarray(img[None]), CFG, strategy))[0]
    assert dev.shape == (28, 28, 3)
    # resize kernels differ (PIL vs jax.image) — require agreement to the
    # level a resampled natural image allows, not bit-exactness
    assert np.mean(np.abs(dev - host)) < 0.25, strategy


def test_letterbox_pads_with_mean_fill():
    # a wide image letterboxed: top/bottom rows come from the fill color,
    # which normalizes to ~0 (fill = mean)
    img = _img(10, 100)
    out = host_vit_transform(img, CFG, "letterbox")
    top_rows = out[:3]
    assert np.abs(top_rows).max() < 0.35  # fill==mean -> ~0 after normalize
    center = out[13:15]
    # real content in the middle: much larger deviation than the fill rows
    assert np.abs(center).mean() > 10 * np.abs(top_rows).mean()


def test_resize_crop_crops_long_side():
    # tall image: resize-crop must keep the vertical center
    img = np.zeros((200, 100, 3), np.uint8)
    img[95:105] = 255  # bright horizontal band at the vertical center
    out = host_vit_transform(img, CFG, "resize-crop")
    mid = out[12:16].mean()
    edge = out[:4].mean()
    assert mid > edge


def test_unknown_strategy_raises():
    with pytest.raises(ValueError):
        host_vit_transform(_img(32, 32), CFG, "bogus")
    with pytest.raises(ValueError):
        vit_transform(jnp.zeros((1, 32, 32, 3), jnp.uint8), CFG, "bogus")


def test_pos_embed_resample_matches_torch():
    """timm resamples abs pos tables with F.interpolate(mode='bicubic',
    antialias=True) in fp32 when img_size overrides the pretrain size
    (timm/layers/pos_embed.py). convert.resample_abs_pos_embed uses torch
    directly when importable — assert that path, AND pin the jax.image
    fallback's agreement so zero-torch environments stay honest."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax
    from omnimamba_tpu.utils.convert import resample_abs_pos_embed

    rng = np.random.default_rng(0)
    g_old, g_new, d = 37, 27, 32  # DINOv2 518px pretrain -> 384px runtime
    pos = rng.normal(size=(1, g_old * g_old, d)).astype(np.float32) * 0.02

    got = resample_abs_pos_embed(pos, g_new)
    want = (
        F.interpolate(
            torch.from_numpy(pos.reshape(1, g_old, g_old, d)).permute(0, 3, 1, 2),
            size=(g_new, g_new), mode="bicubic", antialias=True,
        )
        .permute(0, 2, 3, 1)
        .reshape(1, g_new * g_new, d)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)

    # the torch-free fallback (jax.image cubic+antialias) must stay within
    # interpolation-kernel disagreement of the timm-exact path
    fb = np.asarray(
        jax.image.resize(
            jnp.asarray(pos.reshape(1, g_old, g_old, d)),
            (1, g_new, g_new, d), "cubic", antialias=True,
        )
    ).reshape(1, g_new * g_new, d)
    assert np.abs(fb - want).max() < 2e-3  # unit-scale table, 0.02 std


def test_convert_vit_resamples_pretrain_grid():
    """A checkpoint with the DINOv2 518px table (37x37 + cls + 4 reg) must
    convert onto the 384px runtime grid (27x27) without shape errors."""
    from omnimamba_tpu.config import ViTConfig
    from omnimamba_tpu.utils.convert import convert_timm_vit

    cfg = ViTConfig(
        img_size=54, patch_size=2, width=8, depth=1, num_heads=2,
        num_reg_tokens=4, layerscale=True,
    )  # runtime grid 27
    rng = np.random.default_rng(1)
    g_old, d = 37, 8
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(d, 3, 2, 2)),
        "patch_embed.proj.bias": rng.normal(size=(d,)),
        "pos_embed": rng.normal(size=(1, g_old * g_old, d)),  # no_embed_class
        "cls_token": rng.normal(size=(1, 1, d)),
        "reg_token": rng.normal(size=(1, 4, d)),
        "norm.weight": rng.normal(size=(d,)),
        "norm.bias": rng.normal(size=(d,)),
    }
    for k in ("norm1", "norm2"):
        sd[f"blocks.0.{k}.weight"] = rng.normal(size=(d,))
        sd[f"blocks.0.{k}.bias"] = rng.normal(size=(d,))
    sd["blocks.0.attn.qkv.weight"] = rng.normal(size=(3 * d, d))
    sd["blocks.0.attn.qkv.bias"] = rng.normal(size=(3 * d,))
    sd["blocks.0.attn.proj.weight"] = rng.normal(size=(d, d))
    sd["blocks.0.attn.proj.bias"] = rng.normal(size=(d,))
    sd["blocks.0.mlp.fc1.weight"] = rng.normal(size=(4 * d, d))
    sd["blocks.0.mlp.fc1.bias"] = rng.normal(size=(4 * d,))
    sd["blocks.0.mlp.fc2.weight"] = rng.normal(size=(d, 4 * d))
    sd["blocks.0.mlp.fc2.bias"] = rng.normal(size=(d,))
    sd["blocks.0.ls1.gamma"] = rng.normal(size=(d,))
    sd["blocks.0.ls2.gamma"] = rng.normal(size=(d,))

    params = convert_timm_vit(sd, cfg)
    assert params["pos_embed"].shape == (1, 27 * 27, d)
