"""Draft self-distillation (train/distill.py): the loop must reduce the
teacher-forced CE of the shallow draft against the target's own greedy
streams, and the resulting draft must plug into speculative_generate with a
token-for-token identical stream (draft quality is a speed knob only)."""

import jax
import jax.numpy as jnp

from omnimamba_tpu.models.backbone import init_backbone
from omnimamba_tpu.train.distill import acceptance_eval, distill_draft, make_draft
from tests.test_backbone import tiny_config


def test_distill_reduces_ce_and_streams_stay_identical():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    logs = []
    draft, draft_cfg, metrics = distill_draft(
        params, cfg,
        m_layers=2, steps=30, batch=4, prompt_len=4, gen_len=12,
        pool_batches=2, lr=1e-3, key=jax.random.PRNGKey(1),
        dtype=jnp.float32, log_every=29, log=lambda s: logs.append(s),
    )
    assert draft_cfg.n_layer == 2

    # CE at the end must beat the layer-skip init's CE (first logged step)
    first_ce = float(logs[1].split("CE ")[1].split()[0])
    assert metrics["loss"] < first_ce, (first_ce, metrics)

    ev = acceptance_eval(
        params, cfg, draft, draft_cfg, jax.random.PRNGKey(2),
        n_prompts=2, prompt_len=4, gen_len=12, k_draft=4,
        dtype=jnp.float32,
    )
    assert ev["stream_identical"], ev
    assert ev["drafted"] > 0


def test_make_draft_shares_frozen_embeddings():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    draft, draft_cfg = make_draft(params, cfg, 2)
    assert draft["embedding"] is params["embedding"]  # shared, not copied
    assert draft["layers"]["norm"]["weight"].shape[0] == 2
