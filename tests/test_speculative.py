"""Speculative greedy decode must be a pure SPEEDUP: identical token
streams to plain greedy `generate` for ANY draft (good, shallow, or
garbage) — draft quality may only change the accept rate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.models.backbone import embed_text, init_backbone
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.models.speculative import speculative_generate
from omnimamba_tpu.ops.sampling import SampleParams
from tests.test_backbone import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    emb = embed_text(params, ids, jnp.float32)
    ref = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=30, sample=SampleParams(top_k=1),
    )
    return cfg, params, ids, emb, ref


def _run(cfg, params, ids, emb, **kw):
    return jax.jit(
        lambda p, i, e: speculative_generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=30, **kw,
        )
    )(params, ids, emb)


def test_self_draft_exact_and_full_accept(setup):
    cfg, params, ids, emb, ref = setup
    out = _run(cfg, params, ids, emb, k_draft=4)
    np.testing.assert_array_equal(out.sequences, ref.sequences)
    assert int(out.num_generated) == int(ref.num_generated)
    # the draft IS the target -> every draft accepted
    assert int(out.accepted) == int(out.drafted)
    # K+1 commits/round (plus prefill commit): far fewer rounds than tokens
    assert int(out.rounds) <= -(-int(out.num_generated) // 5) + 1


def test_shallow_draft_exact(setup):
    cfg, params, ids, emb, ref = setup
    out = _run(cfg, params, ids, emb, k_draft=4, draft_layers=2)
    np.testing.assert_array_equal(out.sequences, ref.sequences)


def test_garbage_draft_exact_but_slow(setup):
    """A draft that disagrees everywhere still yields the exact stream —
    just with ~zero acceptance (one correction token per round)."""
    cfg, params, ids, emb, ref = setup
    bad = jax.tree.map(lambda a: a, params)
    bad = dict(bad)
    bad["embedding"] = params["embedding"][
        (jnp.arange(params["embedding"].shape[0]) + 7) % params["embedding"].shape[0]
    ]
    out = _run(cfg, params, ids, emb, k_draft=4, draft_params=bad)
    np.testing.assert_array_equal(out.sequences, ref.sequences)
    assert int(out.accepted) < int(out.drafted)


def test_eos_stop_matches_generate(setup):
    """Pick the first token plain greedy generates as the eos id: both
    paths must stop right after emitting it, with identical sequences."""
    cfg, params, ids, emb, ref = setup
    L0 = ids.shape[1]
    eos = int(np.asarray(ref.sequences)[0, L0 + 2])
    ref_eos = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=30, sample=SampleParams(top_k=1), eos_token_id=eos,
    )
    out = _run(cfg, params, ids, emb, k_draft=4, eos_token_id=eos)
    np.testing.assert_array_equal(out.sequences, ref_eos.sequences)
    assert int(out.num_generated) == int(ref_eos.num_generated)


def test_k_draft_sweep_invariant(setup):
    cfg, params, ids, emb, ref = setup
    for k in (1, 3, 8):
        out = _run(cfg, params, ids, emb, k_draft=k, draft_layers=2)
        np.testing.assert_array_equal(out.sequences, ref.sequences)


def test_ngram_draft_exact(setup):
    """Prompt-lookup drafting (no draft model) still yields the exact
    greedy stream."""
    cfg, params, ids, emb, ref = setup
    out = _run(cfg, params, ids, emb, k_draft=4, draft_mode="ngram")
    np.testing.assert_array_equal(out.sequences, ref.sequences)


def test_ngram_draft_repetitive_prompt(setup):
    """With a repetitive prompt the matcher must still produce the exact
    stream (and exercise the non-fallback lookup path)."""
    cfg, params, _, _, _ = setup
    rep = jnp.asarray([[3, 9, 4, 3, 9, 4, 3, 9]], jnp.int32)
    emb = embed_text(params, rep, jnp.float32)
    ref = generate(
        params, cfg, input_ids=rep, input_embeddings=emb, task="mmu",
        max_length=30, sample=SampleParams(top_k=1),
    )
    out = jax.jit(
        lambda p, i, e: speculative_generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=30, k_draft=4, draft_mode="ngram",
        )
    )(params, rep, emb)
    np.testing.assert_array_equal(out.sequences, ref.sequences)
