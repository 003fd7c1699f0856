"""Fused whole-model Pallas decode step vs the scan-based reference path.

The fused kernel (ops/decode_fused.py) must reproduce backbone_step's
decode exactly: same embeddings in, same greedy token stream out, same
final states — at fp32 on the tiny geometry this is bit-tight (1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.models.backbone import (
    backbone_forward,
    backbone_step,
    backbone_step_fused,
    embed_text,
    init_backbone,
)
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.decode_fused import to_fused_cache
from omnimamba_tpu.ops.sampling import SampleParams
from tests.test_backbone import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(3), cfg)
    ids = jnp.arange(6, dtype=jnp.int32)[None].repeat(2, axis=0)
    emb = embed_text(params, ids, jnp.float32)
    _, cache = backbone_forward(
        params, emb, "mmu", cfg, scan_impl="chunked", return_cache=True
    )
    return cfg, params, ids, cache


def test_fused_step_matches_scan_step(setup):
    cfg, params, ids, cache = setup
    tok = jnp.asarray([3, 5], jnp.int32)
    pos = jnp.int32(6)

    h_ref, cache_ref = backbone_step(
        params, tok, pos, cache, "mmu", cfg, dtype=jnp.float32
    )
    h_fused, fcache = backbone_step_fused(
        params, tok, pos, to_fused_cache(cache, cfg.mixer.d_inner),
        "mmu", cfg, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(h_fused), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )
    # fused cache is sublane-padded along batch; compare the real rows
    B = tok.shape[0]
    ref_ssm = np.asarray(cache_ref.ssm_state)
    np.testing.assert_allclose(
        np.asarray(fcache.ssm)[:, :B],
        ref_ssm.reshape(ref_ssm.shape[0], B, -1, ref_ssm.shape[-1]),
        rtol=1e-5, atol=1e-5,
    )
    ref_conv = np.asarray(cache_ref.conv_state)
    d_inner = cfg.mixer.d_inner
    np.testing.assert_allclose(
        np.asarray(fcache.conv_x)[:, :B], ref_conv[..., :d_inner],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fcache.conv_bc)[:, :B], ref_conv[..., d_inner:],
        rtol=1e-5, atol=1e-5,
    )


def test_fused_step_b1_padding(setup):
    """B=1 (the single-stream case) pads to the 8-row sublane internally
    and must still match the scan step exactly."""
    cfg, params, ids, _ = setup
    emb1 = embed_text(params, ids[:1], jnp.float32)
    _, cache1 = backbone_forward(
        params, emb1, "mmu", cfg, scan_impl="chunked", return_cache=True
    )
    tok = jnp.asarray([4], jnp.int32)
    h_ref, _ = backbone_step(
        params, tok, jnp.int32(6), cache1, "mmu", cfg, dtype=jnp.float32
    )
    h_f, fc = backbone_step_fused(
        params, tok, jnp.int32(6), to_fused_cache(cache1, cfg.mixer.d_inner),
        "mmu", cfg, dtype=jnp.float32,
    )
    assert h_f.shape == h_ref.shape
    assert fc.ssm.shape[1] == 8
    np.testing.assert_allclose(
        np.asarray(h_f), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_step_multi_token_consistency(setup):
    """Run 4 consecutive decode steps through both paths."""
    cfg, params, ids, cache = setup
    fcache = to_fused_cache(cache, cfg.mixer.d_inner)
    scache = cache
    tok = jnp.asarray([1, 2], jnp.int32)
    for i in range(4):
        pos = jnp.int32(6 + i)
        h_ref, scache = backbone_step(
            params, tok, pos, scache, "mmu", cfg, dtype=jnp.float32
        )
        h_f, fcache = backbone_step_fused(
            params, tok, pos, fcache, "mmu", cfg, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(h_f), np.asarray(h_ref), rtol=1e-4, atol=1e-4,
            err_msg=f"step {i}",
        )
        tok = (tok + 7) % cfg.vocab_size


@pytest.mark.parametrize("task", ["mmu", "t2i"])
def test_generate_fused_stream_matches_scan(setup, task):
    cfg, params, _, _ = setup
    if task == "mmu":
        ids = jnp.arange(5, dtype=jnp.int32)[None].repeat(2, axis=0)
        emb = embed_text(params, ids, jnp.float32)
    else:
        from omnimamba_tpu.models.backbone import embed_image_tokens

        ids = (jnp.arange(5, dtype=jnp.int32) % cfg.vqvae_vocab_size)[None].repeat(2, 0)
        emb = embed_image_tokens(params, ids, jnp.float32) + params["pos_embed"][:, :5]
    kw = dict(
        input_ids=ids, input_embeddings=emb, task=task, max_length=17,
        sample=SampleParams(top_k=1), scan_impl="chunked", cache_dtype=None,
    )
    ref = generate(params, cfg, decode_impl="scan", **kw)
    got = generate(params, cfg, decode_impl="fused", **kw)
    np.testing.assert_array_equal(np.asarray(got.sequences), np.asarray(ref.sequences))


def test_fused_with_int8_weights(setup):
    """Quantized {q, scale} weights run through the fused kernel and match
    the scan path's matmul_any dequant numerics."""
    cfg, params, ids, cache = setup
    from omnimamba_tpu.ops.quant import quantize_decode_params

    qparams = quantize_decode_params({"mamba": params})["mamba"]
    tok = jnp.asarray([3, 5], jnp.int32)
    pos = jnp.int32(6)
    h_ref, _ = backbone_step(qparams, tok, pos, cache, "mmu", cfg, dtype=jnp.float32)
    h_f, _ = backbone_step_fused(
        qparams, tok, pos, to_fused_cache(cache, cfg.mixer.d_inner),
        "mmu", cfg, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(h_f), np.asarray(h_ref), rtol=2e-3, atol=2e-3
    )
