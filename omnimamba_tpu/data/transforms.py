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


@partial(jax.jit, static_argnames=("cfg",))
def vit_transform(raw: jax.Array, cfg: ViTConfig) -> jax.Array:
    """uint8 (B, H, W, 3) -> normalized float32 (B, s, s, 3), bicubic
    resize-naive (the shipped strategy, dinosiglip_vit.py:87-107)."""
    x = raw.astype(jnp.float32) / 255.0
    x = resize_image(x, cfg.img_size, cfg.interpolation)
    return normalize(x, cfg.mean, cfg.std)


def dinosiglip_transform(raw: jax.Array, cfg: VisionConfig) -> Dict[str, jax.Array]:
    """The dict-of-pixel-tensors contract of DinoSigLIPImageTransform
    (dinosiglip_vit.py:27-34)."""
    return {"dino": vit_transform(raw, cfg.dino), "siglip": vit_transform(raw, cfg.siglip)}


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
