"""Pinned greedy-stream regression: seed-fixed tiny-model decode must stay
bit-identical across refactors (fp32, CPU, highest matmul precision).

If a deliberate numerics change breaks this, regenerate the fixture with the
snippet in the git history of tests/fixtures_greedy.json and record why.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.models.backbone import (
    embed_image_tokens,
    embed_text,
    init_backbone,
)
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.sampling import SampleParams
from tests.test_backbone import tiny_config

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_greedy.json")


def test_greedy_streams_pinned():
    fixture = json.load(open(FIXTURE))
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(1234), cfg)

    ids = jnp.arange(7, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    out = generate(params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
                   max_length=27, sample=SampleParams(top_k=1), scan_impl="chunked")
    np.testing.assert_array_equal(np.asarray(out.sequences)[0], fixture["mmu"])

    iids = (jnp.arange(6, dtype=jnp.int32) % cfg.vqvae_vocab_size)[None]
    iemb = embed_image_tokens(params, iids, jnp.float32) + params["pos_embed"][:, :6]
    out = generate(params, cfg, input_ids=iids, input_embeddings=iemb, task="t2i",
                   max_length=22, sample=SampleParams(top_k=1), scan_impl="chunked")
    np.testing.assert_array_equal(np.asarray(out.sequences)[0], fixture["t2i"])
