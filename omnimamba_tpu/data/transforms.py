"""On-device image preprocessing — fused resize + normalize.

Replaces the reference's torchvision Compose pipelines
(``dinosiglip_vit.py:74-107``, strategy "resize-naive": bicubic resize to
(384, 384) then per-encoder mean/std normalization). Runs jitted on TPU so
host dataloaders ship raw uint8 and the chip does the rest (SURVEY §7.3
item 7).

Also provides the T2I raw-image path's center-crop (coco_dataset.py:13-24)
and the [-1, 1] scaling the VQ tokenizer expects (coco_dataset.py:51).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.config import ViTConfig, VisionConfig


@partial(jax.jit, static_argnames=("size", "method"))
def resize_image(img: jax.Array, size: int, method: str = "bicubic") -> jax.Array:
    """img: (..., H, W, 3) float -> (..., size, size, 3)."""
    shape = img.shape[:-3] + (size, size, 3)
    return jax.image.resize(img, shape, method=method)


def normalize(img: jax.Array, mean, std) -> jax.Array:
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def _shorter_side_shape(h: int, w: int, target: int) -> tuple:
    """torchvision Resize(int) output shape: shorter side -> target,
    longer side scaled with int() truncation."""
    if h <= w:
        return target, int(target * w / h)
    return int(target * h / w), target


def _center_crop_offsets(h: int, w: int, size: int) -> tuple:
    """torchvision CenterCrop top/left: int(round((dim - size) / 2))."""
    return int(round((h - size) / 2.0)), int(round((w - size) / 2.0))


@partial(jax.jit, static_argnames=("cfg", "strategy"))
def vit_transform(
    raw: jax.Array, cfg: ViTConfig, strategy: str = "resize-naive"
) -> jax.Array:
    """uint8 (B, H, W, 3) -> normalized float32 (B, s, s, 3).

    Strategies (base_vision.py:169-196 / dinosiglip_vit.py:87-130):
    - resize-naive: exact (s, s) resize (the shipped default);
    - resize-crop: shorter side -> floor(s/crop_pct), center crop (s, s);
    - letterbox: symmetric pad to square with the normalization mean
      (as uint8 fill, int(mean*255)), then the default resize+crop.

    Input shapes are static under jit, so aspect-dependent sizes resolve
    at trace time.
    """
    S = cfg.img_size
    x = raw.astype(jnp.float32) / 255.0
    if strategy == "resize-naive":
        x = resize_image(x, S, cfg.interpolation)
    elif strategy in ("resize-crop", "letterbox"):
        if strategy == "letterbox":
            h, w = x.shape[-3], x.shape[-2]
            side = max(h, w)
            ph, pw = (side - h) // 2, (side - w) // 2
            fills = [int(m * 255) / 255.0 for m in cfg.mean]  # static fill
            pad = [(0, 0)] * (x.ndim - 3) + [
                (ph, side - h - ph),
                (pw, side - w - pw),
            ]
            x = jnp.stack(
                [
                    jnp.pad(x[..., c], pad, constant_values=fills[c])
                    for c in range(3)
                ],
                axis=-1,
            )
        h, w = x.shape[-3], x.shape[-2]
        scale_size = int(S / cfg.crop_pct)
        nh, nw = _shorter_side_shape(h, w, scale_size)
        x = jax.image.resize(x, x.shape[:-3] + (nh, nw, 3), cfg.interpolation)
        top, left = _center_crop_offsets(nh, nw, S)
        x = x[..., top : top + S, left : left + S, :]
    else:
        raise ValueError(f"unknown resize strategy {strategy!r}")
    return normalize(x, cfg.mean, cfg.std)


def dinosiglip_transform(
    raw: jax.Array, cfg: VisionConfig, strategy: "str | None" = None
) -> Dict[str, jax.Array]:
    """The dict-of-pixel-tensors contract of DinoSigLIPImageTransform
    (dinosiglip_vit.py:27-34); strategy defaults to cfg.resize_strategy."""
    strategy = strategy or cfg.resize_strategy
    return {
        "dino": vit_transform(raw, cfg.dino, strategy),
        "siglip": vit_transform(raw, cfg.siglip, strategy),
    }


def host_vit_transform(
    img: np.ndarray, cfg: ViTConfig, strategy: str = "resize-naive"
) -> np.ndarray:
    """PIL-exact host-side transform: uint8 (H, W, 3) -> float32 (s, s, 3).

    Byte-matches torchvision's PIL-backed pipeline (Resize/CenterCrop on
    PIL images use PIL's own resampling) — the parity path for fidelity
    work; the jitted ``vit_transform`` is the throughput path (resize
    kernels differ at the last bit).
    """
    from PIL import Image

    interp = {
        "bicubic": Image.BICUBIC,
        "bilinear": Image.BILINEAR,
        "lanczos": Image.LANCZOS,
        "nearest": Image.NEAREST,
    }[cfg.interpolation]
    S = cfg.img_size
    pil = Image.fromarray(img)
    if strategy == "resize-naive":
        pil = pil.resize((S, S), interp)
    elif strategy in ("resize-crop", "letterbox"):
        if strategy == "letterbox":
            w, h = pil.size
            side = max(w, h)
            fill = tuple(int(m * 255) for m in cfg.mean)
            padded = Image.new("RGB", (side, side), fill)
            padded.paste(pil, ((side - w) // 2, (side - h) // 2))
            pil = padded
        w, h = pil.size
        scale_size = int(S / cfg.crop_pct)
        nh, nw = _shorter_side_shape(h, w, scale_size)
        pil = pil.resize((nw, nh), interp)
        top, left = _center_crop_offsets(nh, nw, S)
        pil = pil.crop((left, top, left + S, top + S))
    else:
        raise ValueError(f"unknown resize strategy {strategy!r}")
    x = np.asarray(pil, np.float32) / 255.0
    return ((x - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32))


def host_dinosiglip_transform(
    img: np.ndarray, cfg: VisionConfig, strategy: "str | None" = None
) -> Dict[str, np.ndarray]:
    strategy = strategy or cfg.resize_strategy
    return {
        "dino": host_vit_transform(img, cfg.dino, strategy),
        "siglip": host_vit_transform(img, cfg.siglip, strategy),
    }


def center_crop_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Host-side square center-crop + resize for raw COCO images
    (coco_dataset.py:13-24; lanczos there, PIL-compatible here)."""
    from PIL import Image

    h, w = img.shape[:2]
    crop = min(h, w)
    img = img[(h - crop) // 2 : (h + crop) // 2, (w - crop) // 2 : (w + crop) // 2]
    pil = Image.fromarray(img)
    pil = pil.resize((size, size), Image.LANCZOS)
    return np.asarray(pil).astype(np.uint8)


def to_vq_range(img_uint8: jax.Array) -> jax.Array:
    """uint8 -> [-1, 1] float (coco_dataset.py:51)."""
    return img_uint8.astype(jnp.float32) / 127.5 - 1.0


def from_vq_range(img: jax.Array) -> jax.Array:
    """[-1, 1] float -> uint8, clamped (inference_t2i.py grid save path)."""
    x = jnp.clip((img + 1.0) * 127.5, 0, 255)
    return x.astype(jnp.uint8)
