"""Autoregressive decode engine — one XLA program instead of CUDA graphs.

Reference: ``models/stage2/generation.py:125-434``. The reference prefil ls
with ``input_embeddings`` then replays a captured CUDA graph per token; here
prefill is one jitted chunked-scan forward returning the recurrent cache, and
the token loop is a ``lax.while_loop`` whose body embeds, runs the 48-layer
recurrent step (a ``lax.scan`` over stacked layers), applies the tied head in
fp32 and samples. Constant-memory state, no KV cache, static shapes: compiled
once per (batch, prompt-length, max-length, task).

Faithful semantics:
- first sampled token comes from the prefill logits (num_last_tokens=1)
- decode-step position id = seqlen_offset (generation.py:186-191)
- early stop when *all* current tokens equal eos (generation.py:222-229)
- ``teacher_outputs`` overrides sampling for full-sequence replay
  (generation.py:152-156,214-220 — the reference's own test affordance)

TPU-native addition: optional classifier-free guidance for T2I. Pack
[cond; uncond] along batch, pass ``cfg_scale``; logits are combined as
uncond + s*(cond-uncond) and both streams consume the same sampled token
(the training-time cond-dropout that enables this is in
coco_dataset.py:84 / prompting_utils.py:56-57).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.experimental
import jax.numpy as jnp

from omnimamba_tpu.config import MambaConfig
from omnimamba_tpu.models.backbone import (
    BackboneCache,
    apply_head,
    backbone_forward,
    backbone_step,
    backbone_step_fused,
)
from omnimamba_tpu.ops.sampling import SampleParams, sample_token


class GenerateOutput(NamedTuple):
    sequences: jax.Array  # (B, L0 + new) int32: prompt ids ++ generated
    num_generated: jax.Array  # scalar int32: valid generated count


class _LoopState(NamedTuple):
    n: jax.Array  # tokens sampled so far
    tokens: jax.Array  # (B, T_new) generated buffer (pad-filled)
    logits: jax.Array  # (B, V) fp32 logits for next sample
    cache: BackboneCache
    stopped: jax.Array  # bool: all-eos observed
    key: jax.Array


def generate(
    params: Dict,
    cfg: MambaConfig,
    *,
    input_ids: jax.Array,  # (B, L0)
    input_embeddings: jax.Array,  # (B, L0, d) — positions already applied per task
    task: str,
    max_length: int,
    sample: SampleParams = SampleParams(),
    eos_token_id: Optional[int] = None,
    teacher_outputs: Optional[jax.Array] = None,  # (B, >=max_length) full-seq ids
    key: Optional[jax.Array] = None,
    cfg_scale: Optional[float] = None,
    scan_impl: str = "auto",
    cache_dtype="auto",
    decode_impl: str = "auto",  # auto | fused | scan
    token_callback=None,
    prompt_lengths: Optional[jax.Array] = None,  # (B,) ragged true lengths
) -> GenerateOutput:
    """``token_callback(tokens (B,) np.int32)``: host-side streaming hook —
    the analog of the reference's TextStreamer.put (generation.py:256-257),
    delivered through an ordered io_callback from inside the while_loop.

    ``cache_dtype``: carry the SSM state in this dtype during decode.
    "auto" picks bf16 once the state's HBM traffic becomes the bottleneck
    (B >= 16 on v5e: the fp32 state costs B*48*H*P*N*4 bytes r+w per token
    — the measured B=64 bf16-activation collapse, CLAUDE.md) and keeps the
    reference's fp32 below that; None forces fp32 always
    (bf16 halves the dominant HBM
    traffic of batched decode, ~1.5x throughput at B>=16, with greedy streams
    typically unchanged — verify per-model with eval/fidelity.py).

    ``prompt_lengths`` (B,): RAGGED batching. ``input_ids``/embeddings are
    right-padded to L0; row i's true prompt is its first prompt_lengths[i]
    tokens. Padded positions are exact SSM no-ops (dt=0 masking), each row
    samples its first token from its own last real position, and decode
    positions advance per row — every row's stream is identical to running
    it alone at B=1. No reference analog (its generation is single-stream);
    this is what makes mixed-length batched serving exact."""
    B, L0 = input_ids.shape
    T_new = max_length - L0
    assert T_new > 0, "max_length must exceed prompt length"
    if key is None:
        key = jax.random.PRNGKey(0)
    if prompt_lengths is not None:
        assert teacher_outputs is None and cfg_scale is None, (
            "ragged batching composes with plain sampling only"
        )
        prompt_lengths = jnp.asarray(prompt_lengths, jnp.int32)

    # ---- prefill ----------------------------------------------------------
    hidden, cache = backbone_forward(
        params,
        input_embeddings,
        task,
        cfg,
        scan_impl=scan_impl,
        return_cache=True,
        attn_max_len=max_length,  # KV capacity for any attn layers
        valid_len=prompt_lengths,
    )
    if cache_dtype == "auto":
        cache_dtype = jnp.bfloat16 if B >= 16 else None
    if cache_dtype == "int8" or cache_dtype is jnp.int8:
        # scaled-int8 state ({"q","scale"} per layer; ops/quant): halves
        # the bf16 state FOOTPRINT. ssd_step de/requantizes in registers;
        # error is decay-contracted (does not compound). Measured THROUGHPUT
        # NEGATIVE on v5e-1 (r4: B=96 2123 vs 3621 tok/s) — use only when
        # HBM capacity, not bandwidth, is the constraint.
        from omnimamba_tpu.ops.quant import quantize_ssm_state

        assert decode_impl != "fused", "int8 state rides the scan path"
        cache = cache._replace(ssm_state=quantize_ssm_state(cache.ssm_state))
    elif cache_dtype is not None and hasattr(cache, "_replace"):
        cache = cache._replace(ssm_state=cache.ssm_state.astype(cache_dtype))

    # whole-model fused Pallas decode step (ops/decode_fused.py): streams
    # per-layer weight slabs into VMEM instead of dynamic-slice-copying them
    # every token. Currently OPT-IN: measured at 1.3B B=64 the kernel is
    # serialization-bound at ~46 ms/step vs the scan path's 24 ms (int8 ==
    # bf16 — not bandwidth-limited), so "auto" keeps the scan path until the
    # kernel's pipelining wins.
    use_fused = decode_impl == "fused"
    if use_fused:
        from omnimamba_tpu.ops.decode_fused import to_fused_cache

        cache = to_fused_cache(cache, cfg.mixer.d_inner)
    if prompt_lengths is not None:
        # each row's next-token logits come from its own last REAL position
        h_last = hidden[jnp.arange(B), prompt_lengths - 1]
    else:
        h_last = hidden[:, -1]
    logits0 = apply_head(params, h_last, task)  # (B, V) fp32

    def _combine_cfg(logits):
        if cfg_scale is None:
            return logits
        half = B // 2
        cond, uncond = logits[:half], logits[half:]
        mixed = uncond + cfg_scale * (cond - uncond)
        return jnp.concatenate([mixed, mixed], axis=0)

    logits0 = _combine_cfg(logits0)

    tokens0 = jnp.zeros((B, T_new), jnp.int32)
    state = _LoopState(
        n=jnp.int32(0),
        tokens=tokens0,
        logits=logits0,
        cache=cache,
        stopped=jnp.bool_(False),
        key=key,
    )

    def cond_fn(s: _LoopState):
        return jnp.logical_and(s.n < T_new, jnp.logical_not(s.stopped))

    def body_fn(s: _LoopState):
        key, sub = jax.random.split(s.key)
        logits_s = s.logits
        if sample.repetition_penalty != 1.0:
            # reference decode applies the CTRL penalty over the WHOLE
            # sequence so far (prompt + generated) before each sample
            # (generation.py:246-252). Deliberate divergence, documented:
            # the reference's penalty arm appends each sampled token to
            # sequences_cat TWICE (:249+:250 both run), duplicating every
            # token in its returned stream; the penalty SET is unaffected
            # (duplicates don't change membership) so this engine matches
            # its sampling behavior while returning the un-corrupted
            # stream. Pinned by tests/test_reference_differential_engine.
            from omnimamba_tpu.ops.sampling import apply_repetition_penalty

            prev = jnp.concatenate([input_ids.astype(jnp.int32), s.tokens], axis=1)
            if prompt_lengths is not None:
                # ragged rows: right-pad tokens must not enter the penalty set
                pmask = jnp.arange(L0)[None, :] < prompt_lengths[:, None]
            else:
                pmask = jnp.ones((1, L0), bool)
            gmask = (jnp.arange(T_new)[None, :] < s.n) & jnp.ones((B, 1), bool)
            mask = jnp.concatenate([pmask & jnp.ones((B, 1), bool), gmask], axis=1)
            logits_s = apply_repetition_penalty(
                logits_s, prev, sample.repetition_penalty, mask
            )
        tok = sample_token(sub, logits_s, sample)  # (B,)
        if cfg_scale is not None:
            # one draw per IMAGE: sample from the cond half's (mixed) logits
            # and feed the same token to both streams — independent per-row
            # noise would silently desynchronize the uncond stream
            tok = jnp.concatenate([tok[: B // 2], tok[: B // 2]])
        if teacher_outputs is not None:
            # teacher indexed by absolute position L0+n (generation.py:218)
            t_tok = jax.vmap(lambda row: row[L0 + s.n])(teacher_outputs)
            tok = t_tok.astype(tok.dtype)
        if token_callback is not None:
            jax.experimental.io_callback(token_callback, None, tok, ordered=True)
        tokens = jax.lax.dynamic_update_slice(s.tokens, tok[:, None], (0, s.n))
        stopped = (
            jnp.all(tok == eos_token_id) if eos_token_id is not None else jnp.bool_(False)
        )
        # next logits (position id = L0 + n, generation.py:186-191;
        # ragged rows advance from their own prompt length)
        pos = (prompt_lengths if prompt_lengths is not None else L0) + s.n
        if use_fused:
            hidden, new_cache = backbone_step_fused(
                params, tok, pos, s.cache, task, cfg,
                dtype=input_embeddings.dtype,
            )
        else:
            hidden, new_cache = backbone_step(
                params, tok, pos, s.cache, task, cfg,
                dtype=input_embeddings.dtype,
            )
        logits = _combine_cfg(apply_head(params, hidden, task))
        return _LoopState(
            n=s.n + 1,
            tokens=tokens,
            logits=logits,
            cache=new_cache,
            stopped=stopped,
            key=key,
        )

    final = jax.lax.while_loop(cond_fn, body_fn, state)
    sequences = jnp.concatenate([input_ids.astype(jnp.int32), final.tokens], axis=1)
    return GenerateOutput(sequences=sequences, num_generated=final.n)
