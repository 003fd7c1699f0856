"""Sampler semantics vs the reference's filtering rules
(generation.py:39-121)."""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.ops.sampling import (
    NEG_INF,
    SampleParams,
    apply_min_p,
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    sample_token,
)


def test_top_k_keeps_k_largest():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert np.isneginf(out[0, [0, 2, 3]]).all()


def test_top_p_nucleus():
    # probs ~ [0.643, 0.236, 0.087, 0.032, 0.002] for logits [4,3,2,1,-2]
    logits = jnp.asarray([[4.0, 3.0, 2.0, 1.0, -2.0]])
    out = np.asarray(apply_top_p(logits, 0.8))
    # reference removes tokens with ascending-cumsum <= 1 - p (:65):
    # keep the smallest set covering >= 0.8 => {4, 3}
    assert not np.isneginf(out[0, 0]) and not np.isneginf(out[0, 1])
    assert np.isneginf(out[0, 3]) and np.isneginf(out[0, 4])


def test_top_p_boundaries_noop():
    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(apply_top_p(logits, 0.0)), np.asarray(logits))
    np.testing.assert_array_equal(np.asarray(apply_top_p(logits, 1.0)), np.asarray(logits))


def test_min_p_relative_cutoff():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(apply_min_p(logits, 0.5))  # cutoff = 0.25
    assert not np.isneginf(out[0, 0]) and not np.isneginf(out[0, 1])
    assert np.isneginf(out[0, 2]) and np.isneginf(out[0, 3])


def test_repetition_penalty_signs():
    # negative logits multiply, positive divide (generation.py:80-83)
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    prev = jnp.asarray([[0, 1]])
    out = np.asarray(apply_repetition_penalty(logits, prev, 2.0))
    assert out[0, 0] == 1.0  # 2/2
    assert out[0, 1] == -4.0  # -2*2
    assert out[0, 2] == 1.0  # untouched


def test_greedy_shortcircuit_ignores_temperature():
    logits = jnp.asarray([[0.1, 3.0, 0.2]])
    tok = sample_token(jax.random.PRNGKey(0), logits, SampleParams(top_k=1, temperature=100.0))
    assert int(tok[0]) == 1


def test_topk_sampling_stays_in_topk():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, 5.0, 4.0, -1.0, 2.0]])
    for i in range(20):
        tok = sample_token(
            jax.random.fold_in(key, i), logits, SampleParams(top_k=3, temperature=1.0)
        )
        assert int(tok[0]) in (1, 2, 4)


def test_pure_sampling_distribution():
    key = jax.random.PRNGKey(1)
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
    counts = np.zeros(3)
    for i in range(300):
        tok = sample_token(
            jax.random.fold_in(key, i), logits, SampleParams(top_k=0, top_p=0.0)
        )
        counts[int(tok[0])] += 1
    assert counts[0] > counts[1] > counts[2] > 0
