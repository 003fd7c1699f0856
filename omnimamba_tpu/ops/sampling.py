"""Token samplers — JAX ports of the reference sampler semantics.

Reference: ``models/stage2/generation.py:39-121`` (top-k / top-p / min-p /
temperature / repetition penalty, greedy short-circuit at top_k == 1).

All functions are shape-static and jittable so they can live inside the
decode ``lax.while_loop``. Filtering uses full-vocab masking (sorts instead
of gathers of dynamic size), which is the XLA-friendly formulation of the
same math.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class SampleParams(NamedTuple):
    """Static-at-trace-time sampler configuration (matches generate kwargs,
    reference generation.py:273-287)."""

    top_k: int = 1
    top_p: float = 0.0
    min_p: float = 0.0
    temperature: float = 1.0
    repetition_penalty: float = 1.0


def apply_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    """Mask everything below the k-th largest logit (generation.py:49-52)."""
    if top_k <= 0:
        return logits
    k = min(top_k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1, None]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering (generation.py:57-70): remove tokens whose ascending
    cumulative probability is <= 1 - top_p."""
    if top_p <= 0.0 or top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # smallest kept logit: first position where cum > 1 - top_p
    keep_mask_sorted = cum > (1.0 - top_p)
    # threshold = min over kept sorted logits
    thresh = jnp.min(
        jnp.where(keep_mask_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    """Min-p filtering (generation.py:39-44,108-115): drop tokens whose prob
    is below min_p * max_prob."""
    if min_p <= 0.0 or min_p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = jnp.max(probs, axis=-1, keepdims=True) * min_p
    return jnp.where(probs < cutoff, NEG_INF, logits)


def apply_repetition_penalty(
    logits: jax.Array, prev_tokens: jax.Array, penalty: float,
    prev_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """CTRL-style repetition penalty (generation.py:73-84).

    prev_tokens: (B, T) token ids already emitted; ``prev_mask`` (B, T) marks
    valid entries (the static-shape decode buffer is pre-padded).
    """
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    logits = jnp.asarray(logits)
    prev_tokens = jnp.asarray(prev_tokens, jnp.int32)
    # scatter formulation — O(B*T) instead of a (B, T, V) one-hot, cheap
    # enough to live inside the decode while_loop at serving vocab sizes.
    # Every occurrence of a seen token writes the SAME penalized value
    # (computed from the current logit), so duplicate indices are benign;
    # masked (padding) entries write the min/max identity instead.
    scores = jnp.take_along_axis(logits, prev_tokens, axis=1)  # (B, T)
    pen = jnp.where(scores < 0, scores * penalty, scores / penalty)
    rows = jnp.arange(B)[:, None]
    if penalty >= 1.0:  # penalized <= original: combine with min
        if prev_mask is not None:
            pen = jnp.where(prev_mask, pen, jnp.inf)
        return logits.at[rows, prev_tokens].min(pen)
    if prev_mask is not None:  # amplification: penalized >= original
        pen = jnp.where(prev_mask, pen, -jnp.inf)
    return logits.at[rows, prev_tokens].max(pen)


def sample_token(
    key: jax.Array, logits: jax.Array, params: SampleParams
) -> jax.Array:
    """Sample next token ids (B,) following generation.py:87-121 exactly:

    - top_k == 1: greedy argmax (no temperature)
    - top_k  > 1: top-k filter, temperature, then top-p on the survivors
    - top_k == 0: min-p (if set) or temperature + top-p, then categorical
    """
    logits = logits.astype(jnp.float32)
    if params.top_k == 1:
        return jnp.argmax(logits, axis=-1)
    if params.top_k > 0:
        filtered = apply_top_k(logits, params.top_k)
        if params.temperature != 1.0:
            filtered = filtered / params.temperature
        filtered = apply_top_p(filtered, params.top_p)
        return jax.random.categorical(key, filtered, axis=-1)
    if params.min_p > 0.0:
        filtered = apply_min_p(logits, params.min_p)
        if params.temperature != 1.0:
            filtered = filtered / params.temperature
        return jax.random.categorical(key, filtered, axis=-1)
    filtered = logits / params.temperature if params.temperature != 1.0 else logits
    filtered = apply_top_p(filtered, params.top_p)
    return jax.random.categorical(key, filtered, axis=-1)
