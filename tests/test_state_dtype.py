"""Fidelity gate for the auto bf16 decode-state policy.

``generate(cache_dtype="auto")`` switches the carried SSM state to bf16 at
B >= 16 (where fp32-state HBM traffic collapses batched decode throughput —
the measured B=64 cliff). This pins the policy's behavior:

- below the threshold the state stays fp32 (streams bit-match the
  reference-precision path by construction);
- at/above it, greedy streams must still match the fp32-state decode on the
  seed-fixed tiny model (bf16 rounding may only flip argmax at
  rounding-scale logit margins; a fixed seed makes this deterministic — if
  a deliberate numerics change trips it, compare via
  eval/fidelity.logit_margin_report before loosening).
"""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.models.backbone import embed_text, init_backbone
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.sampling import SampleParams
from tests.test_backbone import tiny_config


def _greedy(params, cfg, B, cache_dtype):
    ids = jnp.tile(jnp.arange(7, dtype=jnp.int32)[None], (B, 1))
    emb = embed_text(params, ids, jnp.float32)
    out = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=23, sample=SampleParams(top_k=1), scan_impl="chunked",
        cache_dtype=cache_dtype,
    )
    return np.asarray(out.sequences)


def test_auto_keeps_fp32_below_threshold():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(7), cfg)
    np.testing.assert_array_equal(
        _greedy(params, cfg, 2, "auto"), _greedy(params, cfg, 2, None)
    )


def test_auto_bf16_state_matches_fp32_streams_at_batch():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(7), cfg)
    auto = _greedy(params, cfg, 16, "auto")
    fp32 = _greedy(params, cfg, 16, None)
    bf16 = _greedy(params, cfg, 16, jnp.bfloat16)
    np.testing.assert_array_equal(auto, bf16)  # policy engaged
    np.testing.assert_array_equal(auto, fp32)  # and stream-faithful


def test_model_level_auto_state_dtype():
    """t2i_generate/mmu_generate must default cache_dtype='auto' (B>=16 ->
    bf16 decode state) — the None default regression cost 11% T2I
    throughput and caused the 'B=64 cliff' (round 2)."""
    import inspect

    from omnimamba_tpu.models.omnimamba import mmu_generate, t2i_generate

    assert inspect.signature(t2i_generate).parameters["cache_dtype"].default == "auto"
    assert inspect.signature(mmu_generate).parameters["cache_dtype"].default == "auto"
