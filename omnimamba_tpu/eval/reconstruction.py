"""Image-reconstruction metrics: PSNR / SSIM + FID feature-stat helpers.

The reference vendors LlamaGen's reconstruction eval
(``llamagen_tokenizer/tokenizer_image/reconstruction_vq_ddp.py:16-39``:
PSNR/SSIM over VQ roundtrips + an FID .npz builder) but with broken upstream
imports (SURVEY §2.2). This is a working JAX re-implementation: jitted,
batched, usable for the BASELINE VQ roundtrip gate and T2I quality tracking.

FID itself needs InceptionV3 activations (weights not shipped); the stat
helpers (mu/sigma accumulation + Frechet distance) are provided so any
feature extractor plugs in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def psnr(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Peak SNR per image over (..., H, W, C) in [-1, 1] by default."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)), axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


@jax.jit
def ssim(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Mean SSIM per image, 11x11 Gaussian window (Wang et al. 2004
    constants) over (..., H, W, C)."""
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel()[:, :, None, None]  # (11,11,1,1)

    def filt(x):
        B = x.shape[0]
        C = x.shape[-1]
        # depthwise conv per channel
        xt = x.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(-1, *x.shape[1:3], 1)
        y = jax.lax.conv_general_dilated(
            xt, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y.reshape(B, C, *y.shape[1:3]).transpose(0, 2, 3, 1)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_a = filt(a * a) - mu_a2
    s_b = filt(b * b) - mu_b2
    s_ab = filt(a * b) - mu_ab
    m = ((2 * mu_ab + C1) * (2 * s_ab + C2)) / (
        (mu_a2 + mu_b2 + C1) * (s_a + s_b + C2)
    )
    return jnp.mean(m, axis=(-3, -2, -1))


class FeatureStats:
    """Streaming mean/covariance accumulator for FID-style stats
    (the .npz builder role of reconstruction_vq_ddp.py)."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(0)
        self.outer += f.T @ f

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = self.outer / self.n - np.outer(mu, mu)
        cov = cov * self.n / max(self.n - 1, 1)
        return mu, cov

    def save(self, path: str) -> None:
        mu, sigma = self.finalize()
        np.savez(path, mu=mu, sigma=sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians (Heusel et al. 2017)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2 * covmean))
