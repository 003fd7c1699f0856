"""Backbone + decode engine: prefill/step logits agreement, greedy generate
self-consistency, teacher forcing, and task routing of the dual heads."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import Mamba2LayerConfig, MambaConfig
from omnimamba_tpu.models.backbone import (
    apply_head,
    backbone_forward,
    backbone_step,
    caption_embed,
    embed_image_tokens,
    embed_text,
    init_backbone,
)
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.sampling import SampleParams


def tiny_config(**kw) -> MambaConfig:
    mixer = Mamba2LayerConfig(
        d_model=32, d_state=16, headdim=8, expand=2, chunk_size=8
    )
    defaults = dict(
        d_model=32,
        n_layer=2,
        vocab_size=64,
        vqvae_vocab_size=32,
        num_tokens=8,
        mmu_pos_len=64,
        pad_vocab_size_multiple=16,
        mixer=mixer,
    )
    defaults.update(kw)
    return MambaConfig(**defaults)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_param_shapes(model):
    cfg, params = model
    assert params["embedding"].shape == (64, 32)
    assert params["img_embeddings"]["word_embeddings"].shape == (32, 32)
    assert params["pos_embed"].shape == (1, cfg.num_tokens + 73, 32)
    assert params["mmu_pos_embed"].shape == (1, 64, 32)
    assert params["layers"]["mixer"]["A_log"].shape == (2, cfg.mixer.nheads)


@pytest.mark.parametrize("task", ["t2i", "mmu"])
def test_prefill_then_step_matches_forward(model, task):
    """Logit-level contract behind the decode loop."""
    cfg, params = model
    B, L = 2, 12
    key = jax.random.PRNGKey(1)
    if task == "t2i":
        ids = jax.random.randint(key, (B, L), 0, cfg.vqvae_vocab_size)
        emb = embed_image_tokens(params, ids, jnp.float32)
        emb = emb + params["pos_embed"][:, :L]
    else:
        ids = jax.random.randint(key, (B, L), 0, cfg.vocab_size)
        emb = embed_text(params, ids, jnp.float32)
        # mmu_pos added inside backbone_forward

    h_full, _ = backbone_forward(params, emb, task, cfg, scan_impl="reference")
    logits_full = apply_head(params, h_full, task)

    L1 = 7
    h_pre, cache = backbone_forward(
        params, emb[:, :L1], task, cfg, scan_impl="chunked", return_cache=True
    )
    np.testing.assert_allclose(
        apply_head(params, h_pre[:, -1], task),
        logits_full[:, L1 - 1],
        rtol=1e-3, atol=1e-3,
    )
    for t in range(L1, L):
        h_t, cache = backbone_step(
            params, ids[:, t], jnp.int32(t), cache, task, cfg, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            apply_head(params, h_t, task), logits_full[:, t], rtol=1e-3, atol=1e-3
        )


def test_generate_greedy_matches_manual(model):
    """generate() == hand-rolled prefill + argmax step loop."""
    cfg, params = model
    B, L0, max_len = 1, 5, 12
    ids = jnp.arange(L0, dtype=jnp.int32)[None]
    emb = embed_image_tokens(params, ids, jnp.float32)
    emb = emb + params["pos_embed"][:, :L0]

    out = generate(
        params, cfg,
        input_ids=ids, input_embeddings=emb, task="t2i",
        max_length=max_len, sample=SampleParams(top_k=1),
    )
    assert out.sequences.shape == (B, max_len)
    assert int(out.num_generated) == max_len - L0

    # manual replay
    h, cache = backbone_forward(params, emb, "t2i", cfg, return_cache=True)
    tok = jnp.argmax(apply_head(params, h[:, -1], "t2i"), -1)
    manual = [int(tok[0])]
    for n in range(1, max_len - L0):
        h_t, cache = backbone_step(
            params, tok, jnp.int32(L0 + n - 1), cache, "t2i", cfg, dtype=jnp.float32
        )
        tok = jnp.argmax(apply_head(params, h_t, "t2i"), -1)
        manual.append(int(tok[0]))
    np.testing.assert_array_equal(np.asarray(out.sequences[0, L0:]), manual)


def test_teacher_forcing_replay(model):
    cfg, params = model
    B, L0, max_len = 1, 4, 10
    ids = jnp.arange(L0, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    teacher = jnp.arange(max_len, dtype=jnp.int32)[None] % cfg.vocab_size
    out = generate(
        params, cfg,
        input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=max_len, teacher_outputs=teacher,
    )
    np.testing.assert_array_equal(
        np.asarray(out.sequences[0, L0:]), np.asarray(teacher[0, L0:])
    )


def test_eos_early_stop(model):
    cfg, params = model
    B, L0, max_len = 1, 4, 20
    ids = jnp.arange(L0, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    eos = 3
    teacher = jnp.full((1, max_len), eos, jnp.int32)
    out = generate(
        params, cfg,
        input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=max_len, teacher_outputs=teacher, eos_token_id=eos,
    )
    # first generated token is eos for every batch element -> stop immediately
    assert int(out.num_generated) == 1


def test_head_routing(model):
    cfg, params = model
    h = jnp.ones((1, cfg.d_model))
    assert apply_head(params, h, "t2i").shape == (1, cfg.vqvae_vocab_size)
    assert apply_head(params, h, "mmu").shape == (1, cfg.padded_vocab_size)


def test_caption_embed_shapes(model):
    cfg, params = model
    x = jnp.ones((2, 5, cfg.d_model))
    assert caption_embed(params, x).shape == (2, 5, cfg.d_model)
