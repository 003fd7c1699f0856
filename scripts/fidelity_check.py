"""Cross-implementation greedy fidelity check (BASELINE output-fidelity
protocol): identical token streams across the Pallas kernel, the chunked-XLA
scan, and the sequential-scan oracle.

Measured result (v5e-1, OmniMamba-1.3B geometry, fp32, greedy 64 new tokens):
all three implementations produce IDENTICAL streams (0/128 mismatches).
In bf16 the argmax can flip where top-2 logit margins are at rounding scale
(use eval/fidelity.logit_margin_report to audit a checkpoint).

Usage:
    python scripts/fidelity_check.py [--dtype float32|bfloat16]
        [--model OmniMamba-1.3B] [--prompt-len 64] [--new-tokens 64]
        [--ckpt weights.npz]
"""

import argparse
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="OmniMamba-1.3B")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--prompt-len", type=int, default=64)
    parser.add_argument("--new-tokens", type=int, default=64)
    parser.add_argument("--task", default="mmu", choices=["mmu", "t2i"])
    parser.add_argument("--ckpt", default=None, help="optional .npz weights")
    parser.add_argument("--seed", type=int, default=0)
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

    from omnimamba_tpu.config import MODEL_REGISTRY
    from omnimamba_tpu.eval.fidelity import compare_streams, greedy_stream
    from omnimamba_tpu.models.backbone import (
        embed_image_tokens,
        embed_text,
        init_backbone,
    )

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    cfg = MODEL_REGISTRY[args.model]()
    params = init_backbone(jax.random.PRNGKey(args.seed), cfg, dtype=dtype)
    if args.ckpt:
        from omnimamba_tpu.utils.checkpoint import load_params_npz

        params = jax.tree.map(jnp.asarray, load_params_npz(args.ckpt, params))

    rng = np.random.default_rng(args.seed)
    if args.task == "mmu":
        ids = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (1, args.prompt_len)), jnp.int32
        )
        emb = embed_text(params, ids, dtype)
    else:
        ids = jnp.asarray(
            rng.integers(0, cfg.vqvae_vocab_size, (1, args.prompt_len)), jnp.int32
        )
        emb = embed_image_tokens(params, ids, dtype)
        emb = emb + params["pos_embed"][:, : args.prompt_len].astype(dtype)

    max_len = args.prompt_len + args.new_tokens
    streams = {}
    for impl in ("chunked", "pallas", "reference"):
        streams[impl] = greedy_stream(
            params, cfg, ids, emb, args.task, max_len, scan_impl=impl
        )
        print(f"{impl:9s} first 12 generated: {streams[impl][0, args.prompt_len:args.prompt_len+12]}")

    ok = True
    for a, b in (("chunked", "pallas"), ("chunked", "reference")):
        d = compare_streams(streams[a], streams[b])
        print(
            f"{a} vs {b}: match={d.match} first_divergence={d.first_divergence} "
            f"mismatches={d.mismatch_count}/{d.n_compared}"
        )
        ok = ok and d.match
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
