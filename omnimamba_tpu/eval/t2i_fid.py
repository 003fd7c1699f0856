"""T2I sample generation + FID pipeline.

The reference reports MS-COCO FID 5.5 (SURVEY §6) computed externally; the
vendored LlamaGen FID tooling is unrunnable (SURVEY §2.2). This module
provides the working pipeline:

- ``generate_samples``: captions -> batched t2i_generate -> uint8 images
  (optionally saved as PNGs for external FID tools);
- ``compute_fid``: Frechet distance between two image sets under a feature
  extractor. InceptionV3 weights aren't shipped in this environment, so the
  default extractor embeds images with the (frozen) VQ-16 *encoder* pooled
  features — a self-contained proxy that tracks distributional drift; plug
  any (B, H, W, 3)->(B, D) callable for standard FID.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from omnimamba_tpu.eval.reconstruction import FeatureStats, frechet_distance


def generate_samples(
    params,
    model,
    uni,
    captions: Sequence[str],
    *,
    batch_size: int = 16,
    cfg_scale: Optional[float] = None,
    sample_params=None,
    seed: int = 0,
    out_dir: Optional[str] = None,
    dtype=None,
) -> np.ndarray:
    """Returns uint8 images (N, 256, 256, 3); writes PNGs when out_dir set.
    Caption block layout matches scripts/inference_t2i.py."""
    import jax
    import jax.numpy as jnp

    from omnimamba_tpu.data.coco import MAX_CAPTION_TOKENS, NULL_PROMPT
    from omnimamba_tpu.data.transforms import from_vq_range
    from omnimamba_tpu.models.omnimamba import t2i_generate
    from omnimamba_tpu.ops.sampling import SampleParams

    if dtype is None:
        dtype = jnp.bfloat16
    if sample_params is None:
        sample_params = SampleParams(top_k=1)
    sp = uni.sptids_dict

    def block(caption: str) -> np.ndarray:
        ids = np.asarray(uni.text_tokenizer(caption)["input_ids"], np.int64)
        pad = np.full(MAX_CAPTION_TOKENS, uni.pad_id, np.int64)
        n = min(len(ids), MAX_CAPTION_TOKENS)
        if n:
            pad[-n:] = ids[:n]
        return np.concatenate(
            [[sp["<|t2i|>"], sp["<|sot|>"]], pad, [sp["<|eot|>"], sp["<|soi|>"]]]
        )

    # one compiled program reused across batches (eager dispatch through
    # the device tunnel is ~50x slower — measured 1152 s for 32 images)
    gen = jax.jit(
        lambda p, ids, k: t2i_generate(
            p, model, ids, sample=sample_params, key=k,
            cfg_scale=cfg_scale, dtype=dtype,
        )[0]
    )

    images: List[np.ndarray] = []
    key = jax.random.PRNGKey(seed)
    for i in range(0, len(captions), batch_size):
        batch = list(captions[i : i + batch_size])
        n_real = len(batch)
        while len(batch) < batch_size:  # keep shapes static
            batch.append(batch[-1])
        ids = np.stack([block(c) for c in batch])
        if cfg_scale is not None:
            un = np.stack([block(NULL_PROMPT)] * batch_size)
            ids = np.concatenate([ids, un], axis=0)
        key, sub = jax.random.split(key)
        imgs = gen(params, jnp.asarray(ids, jnp.int32), sub)
        arr = np.asarray(from_vq_range(imgs))[:n_real]
        images.append(arr)
    out = np.concatenate(images, axis=0)

    if out_dir:
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        for j, img in enumerate(out):
            Image.fromarray(img).save(os.path.join(out_dir, f"{j:06d}.png"))
    return out


def vq_encoder_features(params, vq_cfg) -> Callable[[np.ndarray], np.ndarray]:
    """Feature extractor from the frozen VQ-16 encoder: spatially-pooled
    pre-quant latents (B, z_channels). Proxy for Inception features."""
    import functools

    import jax
    import jax.numpy as jnp

    from omnimamba_tpu.models.vq import conv2d, encoder_forward

    @functools.partial(jax.jit, static_argnums=())
    def embed(x):
        h = encoder_forward(params["encoder"], x, vq_cfg)
        h = conv2d(params["quant_conv"], h)
        return jnp.mean(h, axis=(1, 2))

    def fn(imgs_uint8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(imgs_uint8, jnp.float32) / 127.5 - 1.0
        return np.asarray(embed(x), np.float64)

    return fn


def default_features(
    params, vq_cfg, inception_weights: str = ""
) -> Callable[[np.ndarray], np.ndarray]:
    """Standard-FID feature selector.

    Uses InceptionV3 pool3 (eval/inception.py) whenever weights are given
    (``inception_weights`` arg or $OMNIMAMBA_INCEPTION_WEIGHTS) — the ONLY
    features comparable with published MS-COCO FID (reference teaser 5.5).
    Falls back to the frozen VQ-encoder proxy otherwise (zero-egress
    default) with a loud warning: that is a relative metric only.
    """
    import os as _os

    path = inception_weights or _os.environ.get("OMNIMAMBA_INCEPTION_WEIGHTS", "")
    if path and _os.path.exists(path):
        from omnimamba_tpu.eval.inception import inception_features

        return inception_features(path)
    import logging

    logging.getLogger("omnimamba").warning(
        "FID falling back to VQ-encoder features: RELATIVE metric only, NOT "
        "comparable to InceptionV3-based MS-COCO FID (set "
        "OMNIMAMBA_INCEPTION_WEIGHTS=<inception_v3 .pth/.npz> for standard FID)"
    )
    return vq_encoder_features(params, vq_cfg)


def compute_fid(
    images_a: np.ndarray,
    images_b: np.ndarray,
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 32,
) -> float:
    """FID between two uint8 image sets under feature_fn."""

    def stats(images):
        first = feature_fn(images[:1])
        fs = FeatureStats(first.shape[-1])
        for i in range(0, len(images), batch_size):
            fs.update(feature_fn(images[i : i + batch_size]))
        return fs.finalize()

    mu_a, s_a = stats(images_a)
    mu_b, s_b = stats(images_b)
    return frechet_distance(mu_a, s_a, mu_b, s_b)
