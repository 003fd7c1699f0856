"""Continuation prefill (backbone_forward from an existing decode cache)
must reproduce the sequential backbone_step trajectory EXACTLY — it is the
one-weight-read multi-token primitive behind chunked prefill, prefix-cache
serving, and the speculative-decode verify pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.models.backbone import (
    apply_head,
    backbone_forward,
    backbone_step,
    embed_decode_window,
    embed_text,
    init_backbone,
)
from tests.test_backbone import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, L0, K = 2, 7, 5
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L0)), jnp.int32)
    window = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, K)), jnp.int32)
    emb = embed_text(params, prompt, jnp.float32)
    _, cache = backbone_forward(params, emb, "mmu", cfg, return_cache=True)
    return cfg, params, prompt, window, cache


def _sequential(cfg, params, window, cache, L0):
    hs = []
    for t in range(window.shape[1]):
        h, cache = backbone_step(
            params, window[:, t], jnp.int32(L0 + t), cache, "mmu", cfg,
            dtype=jnp.float32,
        )
        hs.append(h)
    return jnp.stack(hs, axis=1), cache


def test_continuation_matches_sequential_steps(setup):
    cfg, params, prompt, window, cache = setup
    L0 = prompt.shape[1]
    h_seq, cache_seq = _sequential(cfg, params, window, cache, L0)

    wemb = embed_decode_window(params, window, L0, "mmu", cfg, jnp.float32)
    h_win, cache_win = jax.jit(
        lambda p, e, c: backbone_forward(
            p, e, "mmu", cfg, add_mmu_pos=False, return_cache=True,
            initial_cache=c,
        )
    )(params, wemb, cache)

    np.testing.assert_allclose(h_win, h_seq, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        cache_win.ssm_state, cache_seq.ssm_state, atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        cache_win.conv_state, cache_seq.conv_state, atol=2e-4, rtol=1e-4
    )
    # logits agree too (the verify pass consumes these)
    lg_seq = apply_head(params, h_seq[:, -1], "mmu")
    lg_win = apply_head(params, h_win[:, -1], "mmu")
    np.testing.assert_allclose(lg_win, lg_seq, atol=2e-3, rtol=1e-4)


def test_valid_len_masks_padding_exactly(setup):
    """A window padded past valid_len must yield the same real-position
    outputs and the same final cache as the unpadded window."""
    cfg, params, prompt, window, cache = setup
    L0 = prompt.shape[1]
    K = window.shape[1]
    h_ref, cache_ref = _sequential(cfg, params, window, cache, L0)

    pad = 3
    garbage = jnp.full((window.shape[0], pad), 7, jnp.int32)
    padded = jnp.concatenate([window, garbage], axis=1)
    wemb = embed_decode_window(params, padded, L0, "mmu", cfg, jnp.float32)
    h_win, cache_win = jax.jit(
        lambda p, e, c, v: backbone_forward(
            p, e, "mmu", cfg, add_mmu_pos=False, return_cache=True,
            initial_cache=c, valid_len=v,
        )
    )(params, wemb, cache, jnp.int32(K))

    np.testing.assert_allclose(h_win[:, :K], h_ref, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        cache_win.ssm_state, cache_ref.ssm_state, atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        cache_win.conv_state, cache_ref.conv_state, atol=2e-4, rtol=1e-4
    )


def test_cold_start_equals_plain_forward(setup):
    """initial_cache=None + valid_len=None must be unchanged by the new
    plumbing: same hidden states as before the feature existed."""
    cfg, params, prompt, _, _ = setup
    emb = embed_text(params, prompt, jnp.float32)
    h0, c0 = backbone_forward(params, emb, "mmu", cfg, return_cache=True)
    h1, c1 = backbone_forward(
        params, emb, "mmu", cfg, return_cache=True, valid_len=None
    )
    np.testing.assert_array_equal(h0, h1)
    np.testing.assert_array_equal(c0.ssm_state, c1.ssm_state)


def test_ragged_batched_generate_matches_per_row(setup):
    """Right-padded mixed-length prompts with prompt_lengths must produce
    EXACTLY the stream each row gets alone at B=1 (padding is a state
    no-op; positions advance per row)."""
    import jax
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams

    cfg, params, _, _, _ = setup
    rng = np.random.default_rng(7)
    lens = [4, 6, 3]
    L0 = max(lens)
    rows = [rng.integers(0, cfg.vocab_size, (n,)) for n in lens]
    padded = np.zeros((len(lens), L0), np.int32)
    for i, r in enumerate(rows):
        padded[i, : len(r)] = r

    T = 10
    emb = embed_text(params, jnp.asarray(padded), jnp.float32)
    out = jax.jit(
        lambda p, i, e, v: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + T, sample=SampleParams(top_k=1),
            prompt_lengths=v, cache_dtype=None,
        ).sequences
    )(params, jnp.asarray(padded), emb, jnp.asarray(lens, jnp.int32))

    for i, r in enumerate(rows):
        ids1 = jnp.asarray(r[None], jnp.int32)
        emb1 = embed_text(params, ids1, jnp.float32)
        ref = generate(
            params, cfg, input_ids=ids1, input_embeddings=emb1, task="mmu",
            max_length=lens[i] + T, sample=SampleParams(top_k=1),
            cache_dtype=None,
        )
        np.testing.assert_array_equal(
            np.asarray(out)[i, L0 : L0 + T],
            np.asarray(ref.sequences)[0, lens[i] : lens[i] + T],
        )
