"""Long-context benchmark: prefill scaling + decode flatness.

The reference's headline claim (README:31, teaser panels c/d) is that the
linear SSM keeps decode speed and memory FLAT in context length (119x faster
than Show-o at 16K, -63% memory). This script produces those curves for the
TPU build: prefill wall time at several context lengths (Pallas chunked
scan, O(L)) and steady decode rate + recurrent-state bytes afterwards
(O(1) — no KV cache).

Usage:
    python scripts/bench_longctx.py [--lengths 2048 8192 16384 32768]
        [--decode-tokens 128] [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lengths", type=int, nargs="+",
                        default=[2048, 8192, 16384, 32768])
    parser.add_argument("--decode-tokens", type=int, default=128)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    import jax.numpy as jnp

    from omnimamba_tpu.config import MambaConfig
    from omnimamba_tpu.models.backbone import (
        backbone_forward,
        embed_text,
        init_backbone,
    )
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams
    from omnimamba_tpu.utils.profiling import hard_sync

    cfg = MambaConfig()
    params = init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B = args.batch
    rng = np.random.default_rng(0)

    print(f"| context L | prefill ms | decode tok/s | recurrent state MB |")
    print(f"|---|---|---|---|")
    for L in args.lengths:
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
        emb = embed_text(params, ids, jnp.bfloat16)

        prefill = jax.jit(
            lambda p, e: backbone_forward(
                p, e, "mmu", cfg, scan_impl="pallas", return_cache=True
            )
        )
        out = prefill(params, emb)
        hard_sync(out[0])
        t0 = time.time()
        out = prefill(params, emb)
        hard_sync(out[0])
        t_prefill = (time.time() - t0) * 1e3

        cache = out[1]
        state_mb = sum(
            np.prod(x.shape) * x.dtype.itemsize
            for x in [cache.conv_state, cache.ssm_state]
        ) / 1e6

        T = args.decode_tokens
        gen = jax.jit(
            lambda p, i, e: generate(
                p, cfg, input_ids=i, input_embeddings=e, task="mmu",
                max_length=L + T, sample=SampleParams(top_k=1),
            ).sequences
        )
        seq = gen(params, ids, emb)
        hard_sync(seq)
        t0 = time.time()
        seq = gen(params, ids, emb)
        hard_sync(seq)
        t_total = time.time() - t0
        # decode rate net of prefill
        tps = B * T / max(t_total - t_prefill / 1e3, 1e-9)
        print(f"| {L} | {t_prefill:.0f} | {tps:.0f} | {state_mb:.0f} |")


if __name__ == "__main__":
    main()
