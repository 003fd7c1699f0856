"""Differential test of the DECODE ENGINE against the actual reference
``models/stage2/generation.py:decode`` (r5).

Both engines are driven by the SAME logits source: a duck-typed torch-protocol
wrapper around the repo's tiny JAX backbone (prefill via ``backbone_forward``,
steps via ``backbone_step`` — exactly the calls ``models/generation.generate``
makes), handed to the reference ``decode()``. Identical logits isolate the
ENGINE contract: stopping conditions, teacher forcing, position bookkeeping,
repetition-penalty application, scores placement.

Documented divergence pinned here: the reference's repetition-penalty arm
appends each sampled token to ``sequences_cat`` twice (generation.py — both
the penalty-branch append and the unconditional append run), so its returned
stream under penalty != 1 carries every generated token duplicated. The
penalty SET is unchanged by duplicates, so this repo's engine reproduces its
sampling decisions while returning the un-duplicated stream.
"""

from __future__ import annotations

import os
import sys
from collections import namedtuple

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from omnimamba_tpu.models.backbone import (
    apply_head,
    backbone_forward,
    backbone_step,
    embed_text,
    init_backbone,
)
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.sampling import SampleParams
from tests.test_backbone import tiny_config

_Out = namedtuple("_Out", ["t2i_logits", "mmu_logits"])


class JaxBackedRefModel:
    """Duck-typed model for the reference decode() loop: prefill on
    embeddings, then single-token steps — the same repo calls generate()
    makes, so both engines see bit-identical logits."""

    def __init__(self, params, cfg, task="mmu"):
        self.params, self.cfg, self.task = params, cfg, task
        self._cache = None
        self._L0 = None

    def __call__(
        self, input_ids=None, input_embeddings=None, position_ids=None,
        cond=None, task=None, inference_params=None, num_last_tokens=1,
    ):
        task = task or self.task
        if inference_params.seqlen_offset == 0:
            emb = jnp.asarray(input_embeddings.numpy())
            hidden, self._cache = backbone_forward(
                self.params, emb, task, self.cfg,
                scan_impl="chunked", return_cache=True,
            )
            self._L0 = emb.shape[1]
            logits = apply_head(self.params, hidden[:, -1], task)
        else:
            tok = jnp.asarray(input_ids.numpy()[:, 0], jnp.int32)
            pos = jnp.int32(inference_params.seqlen_offset)
            hidden, self._cache = backbone_step(
                self.params, tok, pos, self._cache, task, self.cfg,
                dtype=jnp.float32,
            )
            logits = apply_head(self.params, hidden, task)
        t = torch.from_numpy(np.asarray(logits, np.float32).copy())[:, None]
        return _Out(t2i_logits=t, mmu_logits=t)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    B, L0 = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L0), 0, cfg.vocab_size)
    emb = embed_text(params, ids, jnp.float32)
    return cfg, params, ids, emb


class _NoEvent:
    def __init__(self, *a, **k):
        pass

    def record(self, *a, **k):
        pass


def _ref_decode(cfg, params, ids, emb, max_length, task="mmu", **kw):
    from models.stage2.generation import decode as ref_decode

    model = JaxBackedRefModel(params, cfg, task)
    # decode() constructs torch.cuda.Event unconditionally (generation.py
    # :232-233) — harmless timing objects; stub them on CPU torch
    real_event = torch.cuda.Event
    torch.cuda.Event = _NoEvent
    try:
        out = ref_decode(
            torch.from_numpy(np.asarray(ids).copy()),
            torch.from_numpy(np.asarray(emb, np.float32).copy()),
            model, max_length, task=task, **kw,
        )
    finally:
        torch.cuda.Event = real_event
    return out


def test_greedy_engine_matches(setup):
    cfg, params, ids, emb = setup
    max_length = 14
    ref = _ref_decode(cfg, params, ids, emb, max_length, top_k=1)
    mine = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=max_length, sample=SampleParams(top_k=1),
        scan_impl="chunked", cache_dtype=None,
    )
    np.testing.assert_array_equal(
        np.asarray(mine.sequences), ref.sequences.numpy()
    )
    # scores: one per generated position
    assert len(ref.scores) == max_length - ids.shape[1]


def test_teacher_forcing_and_eos_stop(setup):
    """teacher_outputs force the stream; an all-eos teacher token stops the
    reference loop — the repo engine must stop at the same position."""
    cfg, params, ids, emb = setup
    B, L0 = ids.shape
    max_length = 16
    eos = 3
    teacher = np.full((B, max_length), 7, np.int64)
    teacher[:, : L0] = np.asarray(ids)
    teacher[:, L0 + 4] = eos  # 5th generated token is eos for ALL rows

    ref = _ref_decode(
        cfg, params, ids, emb, max_length, top_k=1, eos_token_id=eos,
        teacher_outputs=torch.from_numpy(teacher),
    )
    mine = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=max_length, sample=SampleParams(top_k=1),
        eos_token_id=eos, teacher_outputs=jnp.asarray(teacher),
        scan_impl="chunked", cache_dtype=None,
    )
    ref_seq = ref.sequences.numpy()
    n_gen = int(mine.num_generated)
    assert ref_seq.shape[1] == L0 + n_gen  # same stop position
    np.testing.assert_array_equal(
        np.asarray(mine.sequences)[:, : L0 + n_gen], ref_seq
    )
    assert np.all(ref_seq[:, -1] == eos)


def test_repetition_penalty_sampling_matches(setup):
    """Greedy + penalty 1.3: the reference's penalty arm duplicates every
    sampled token in sequences_cat (documented divergence) — its SAMPLING
    decisions (the de-duplicated stream) must equal the repo engine's."""
    cfg, params, ids, emb = setup
    B, L0 = ids.shape
    max_length = 14
    ref = _ref_decode(
        cfg, params, ids, emb, max_length, top_k=1, repetition_penalty=1.3
    )
    mine = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=max_length,
        sample=SampleParams(top_k=1, repetition_penalty=1.3),
        scan_impl="chunked", cache_dtype=None,
    )
    ref_seq = ref.sequences.numpy()
    # pin the reference bug so an upstream change is noticed
    gen = ref_seq[:, L0:]
    assert gen.shape[1] % 2 == 0
    assert np.array_equal(gen[:, 0::2], gen[:, 1::2]), (
        "reference no longer duplicates tokens under repetition penalty — "
        "revisit the documented divergence"
    )
    dedup = gen[:, 0::2]
    np.testing.assert_array_equal(
        np.asarray(mine.sequences)[:, L0 : L0 + dedup.shape[1]], dedup
    )
    # and the penalty must actually bite: streams differ from plain greedy
    plain = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=max_length, sample=SampleParams(top_k=1),
        scan_impl="chunked", cache_dtype=None,
    )
    assert not np.array_equal(
        np.asarray(mine.sequences), np.asarray(plain.sequences)
    )
