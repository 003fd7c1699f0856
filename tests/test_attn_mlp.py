"""Dormant config options: MHA mixer layers (attn_layer_idx) + GatedMLP
(d_intermediate > 0) — forward/step consistency and generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.models.backbone import (
    apply_head,
    backbone_forward,
    backbone_step,
    embed_text,
    init_backbone,
)
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.attention import (
    MHACache,
    init_mha,
    mha_forward,
    mha_step,
)
from omnimamba_tpu.ops.sampling import SampleParams
from tests.test_backbone import tiny_config


def test_mha_step_matches_forward():
    d, H, B, L = 32, 4, 2, 10
    params = init_mha(jax.random.PRNGKey(0), d)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, d))
    y_full, _ = mha_forward(params, x, H, rotary_dim=8)
    L1 = 6
    y_pre, cache = mha_forward(
        params, x[:, :L1], H, rotary_dim=8, return_cache=True, max_len=L
    )
    np.testing.assert_allclose(
        np.asarray(y_pre), np.asarray(y_full[:, :L1]), rtol=1e-4, atol=1e-5
    )
    for t in range(L1, L):
        y_t, cache = mha_step(params, x[:, t], cache, H, rotary_dim=8)
        np.testing.assert_allclose(
            np.asarray(y_t), np.asarray(y_full[:, t]), rtol=1e-4, atol=1e-5
        )


@pytest.fixture(scope="module")
def het_model():
    cfg = dataclasses.replace(
        tiny_config(), attn_layer_idx=(1,), attn_num_heads=4, d_intermediate=64
    )
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_het_layer_structure(het_model):
    cfg, params = het_model
    assert isinstance(params["layers"], list)
    assert "qkv" in params["layers"][1]["mixer"]  # attn layer
    assert "in_proj" in params["layers"][0]["mixer"]  # mamba layer
    assert "mlp" in params["layers"][0]  # GatedMLP everywhere


def test_het_prefill_step_consistency(het_model):
    cfg, params = het_model
    B, L, L1 = 1, 12, 8
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, cfg.vocab_size)
    emb = embed_text(params, ids, jnp.float32)
    h_full, _ = backbone_forward(params, emb, "mmu", cfg, attn_max_len=L)
    logits_full = apply_head(params, h_full, "mmu")

    h_pre, cache = backbone_forward(
        params, emb[:, :L1], "mmu", cfg, return_cache=True, attn_max_len=L
    )
    np.testing.assert_allclose(
        np.asarray(apply_head(params, h_pre[:, -1], "mmu")),
        np.asarray(logits_full[:, L1 - 1]),
        rtol=1e-3, atol=1e-3,
    )
    for t in range(L1, L):
        h_t, cache = backbone_step(
            params, ids[:, t], jnp.int32(t), cache, "mmu", cfg, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(apply_head(params, h_t, "mmu")),
            np.asarray(logits_full[:, t]),
            rtol=1e-3, atol=1e-3,
        )


def test_het_generate(het_model):
    cfg, params = het_model
    ids = jnp.arange(5, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    out = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=14, sample=SampleParams(top_k=1), scan_impl="chunked",
    )
    assert out.sequences.shape == (1, 14)
    assert int(out.num_generated) == 9
