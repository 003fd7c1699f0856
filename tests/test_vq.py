"""VQ-16 tokenizer: geometry, roundtrip on the reference validation image,
straight-through gradients, codebook lookup identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import VQConfig, vq_16, vq_8
from omnimamba_tpu.models.vq import init_vq, quantize
from omnimamba_tpu.models import vq as vq_mod

# jitted wrappers: eager conv dispatch on CPU is ~50x slower than compiled
import functools


@functools.partial(jax.jit, static_argnums=2)
def vq_encode(params, img, cfg):
    return vq_mod.vq_encode(params, img, cfg)


@functools.partial(jax.jit, static_argnums=2)
def vq_decode(params, quant, cfg):
    return vq_mod.vq_decode(params, quant, cfg)


@functools.partial(jax.jit, static_argnums=2)
def vq_decode_code(params, idx, cfg):
    return vq_mod.vq_decode_code(params, idx, cfg)


def small_cfg():
    # tiny 3-level model (f4) for fast tests; same code paths as VQ-16
    return VQConfig(
        codebook_size=64,
        codebook_embed_dim=8,
        ch=16,
        num_res_blocks=1,
        encoder_ch_mult=(1, 1, 2),
        decoder_ch_mult=(1, 1, 2),
        z_channels=16,
    )


@pytest.fixture(scope="module")
def vq():
    cfg = small_cfg()
    params = init_vq(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_downsample_factor():
    assert vq_16().downsample_factor == 16
    assert vq_8().downsample_factor == 8


def test_encode_decode_shapes(vq):
    cfg, params = vq
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
    out = vq_encode(params, img, cfg)
    f = cfg.downsample_factor
    assert out.indices.shape == (2, 32 // f, 32 // f)
    assert out.quant.shape == (2, 32 // f, 32 // f, cfg.codebook_embed_dim)
    rec = vq_decode(params, out.quant, cfg)
    assert rec.shape == img.shape


def test_decode_code_matches_decode(vq):
    """decode_code(indices) == decode(codebook[indices]) — the T2I output
    path (mamba_vlm.py:104-108)."""
    cfg, params = vq
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3), minval=-1, maxval=1)
    out = vq_encode(params, img, cfg)
    rec1 = vq_decode(params, out.quant, cfg)
    flat = out.indices.reshape(1, -1)
    rec2 = vq_decode_code(params, flat, cfg)
    np.testing.assert_allclose(rec1, rec2, rtol=1e-4, atol=1e-4)


def test_quantize_codes_are_nearest(vq):
    cfg, params = vq
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, cfg.codebook_embed_dim))
    out = quantize(params, z, cfg)
    zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    cb = params["codebook"] / jnp.linalg.norm(params["codebook"], axis=-1, keepdims=True)
    d = jnp.sum(zn[..., None, :] ** 2, -1) + jnp.sum(cb**2, -1) - 2 * zn @ cb.T
    np.testing.assert_array_equal(np.asarray(jnp.argmin(d, -1)), np.asarray(out.indices))


def test_straight_through_gradient(vq):
    cfg, params = vq

    def loss(img):
        out = vq_mod.vq_encode(params, img, cfg, training=True)
        rec = vq_mod.vq_decode(params, out.quant, cfg)
        return jnp.mean(rec**2) + out.vq_loss + out.commit_loss

    img = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3), minval=-1, maxval=1)
    g = jax.jit(jax.grad(loss))(img)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_cat_dog_roundtrip_geometry():
    """BASELINE gate config #1: encode->decode roundtrip on
    mmu_validation/cat_dog.png (shapes/geometry; weights are random here)."""
    from PIL import Image

    cfg = small_cfg()
    params = init_vq(jax.random.PRNGKey(5), cfg)
    img = Image.open("/root/reference/mmu_validation/cat_dog.png").convert("RGB")
    img = img.resize((64, 64))
    x = (np.asarray(img).astype(np.float32) / 127.5 - 1.0)[None]
    out = vq_encode(params, jnp.asarray(x), cfg)
    rec = vq_decode(params, out.quant, cfg)
    assert rec.shape == x.shape
    assert bool(jnp.isfinite(rec).all())
