"""merge_lora: folding task LoRA into in_proj must reproduce the unmerged
forward exactly (inference applies no LoRA dropout), and composes with the
fused/quantized decode fast paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.models.backbone import backbone_forward, embed_text, init_backbone
from omnimamba_tpu.utils.lora import merge_lora
from tests.test_backbone import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # fresh LoRA B is zeros (standard init) -> merging would be a no-op and
    # the tests vacuous; give every adapter real weight
    lora = params["layers"]["mixer"]["lora"]
    keys = jax.random.split(jax.random.PRNGKey(42), len(lora))
    params["layers"]["mixer"]["lora"] = {
        k: 0.3 * jax.random.normal(kk, v.shape, v.dtype)
        for (k, v), kk in zip(lora.items(), keys)
    }
    ids = jnp.arange(12, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    return cfg, params, emb


def test_merged_forward_matches(setup):
    cfg, params, emb = setup
    merged = merge_lora(params, "t2i", cfg.lora)
    h0, _ = jax.jit(lambda p: backbone_forward(p, emb, "t2i", cfg))(params)
    h1, _ = jax.jit(lambda p: backbone_forward(p, emb, "t2i", cfg))(merged)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=2e-5, atol=2e-5)


def test_merge_is_task_specific(setup):
    """Merging t2i drops ALL adapters: the merged tree is wrong for mmu
    (its adapters are gone AND t2i deltas are baked in) — outputs differ."""
    cfg, params, emb = setup
    merged = merge_lora(params, "t2i", cfg.lora)
    fwd = jax.jit(lambda p: backbone_forward(p, emb, "mmu", cfg)[0])
    assert float(jnp.abs(fwd(merged) - fwd(params)).max()) > 1e-6


def test_merged_composes_with_fused_quant(setup):
    """merge -> fuse_in_proj -> forward still matches (the decode fast path
    the merge re-enables); fusing FIRST is rejected."""
    cfg, params, emb = setup
    from omnimamba_tpu.ops.quant import fuse_in_proj

    merged = merge_lora(params, "t2i", cfg.lora)
    fused = fuse_in_proj(merged)
    h0, _ = jax.jit(lambda p: backbone_forward(p, emb, "t2i", cfg))(params)
    h1, _ = jax.jit(lambda p: backbone_forward(p, emb, "t2i", cfg))(fused)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=2e-5, atol=2e-5)

    with pytest.raises(ValueError, match="unfused"):
        merge_lora(fuse_in_proj(params), "t2i", cfg.lora)


def test_merge_noop_without_lora(setup):
    cfg, params, _ = setup
    import dataclasses

    cfg_nl = dataclasses.replace(cfg, lora=None)
    p2 = init_backbone(jax.random.PRNGKey(1), cfg_nl, dtype=jnp.float32)
    out = merge_lora(p2, "t2i", cfg.lora)
    assert jax.tree.structure(out) == jax.tree.structure(p2)
