"""Single-stream (B=1) decode floor analysis — VERDICT r4 item 6.

Measured state: B=1 int8 decode = ~299 tok/s (3.3 ms/tok) vs a ~570 tok/s
int8 weight-byte floor (1.5 GB / 819 GB/s = 1.8 ms/tok). int8 == bf16 at
B=1 (r2) already shows the bottleneck is NOT weight bandwidth. This script
separates the remaining time into (a) weight bytes and (b) per-op / per-
layer latency by sweeping the program GEOMETRY while holding the op graph
fixed:

  1. 1.3B, 48 layers  (baseline: full bytes, full op count)
  2. 1.3B, 24 layers  (half bytes, half op count)
  3. d_model/8 ("tiny"), 48 layers (≈1.6% of the bytes, SAME op count)

If run-3 keeps most of run-1's per-token time, the decode step is op-
latency-bound: time ≈ n_ops x per-op latency, and no weight compression
can reach the byte floor. The per-layer latency estimate is then
  lat ≈ (t_tiny48) / 48
and the model-independent floor at 48 layers ≈ 48*lat + bytes/BW.

Usage: python scripts/b1_floor_analysis.py [--tokens 128]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(leaf.ravel()[-1])


def measure(cfg, tokens: int, label: str, quantize: bool) -> float:
    import jax
    import jax.numpy as jnp

    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params
    from omnimamba_tpu.ops.sampling import SampleParams

    params = {"mamba": init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)}
    if quantize:
        params = fuse_in_proj(quantize_decode_params(params))
    n_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params["mamba"])
    )
    rng = np.random.default_rng(0)
    L0 = 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, L0)), jnp.int32)
    emb = embed_text(params["mamba"], ids, jnp.bfloat16)
    f = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + tokens, sample=SampleParams(top_k=1),
        ).sequences
    )
    out = f(params["mamba"], ids, emb)
    sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = f(params["mamba"], ids, emb)
        sync(out)
        best = min(best, (time.time() - t0) / tokens)
    print(
        f"[{label}] {1.0/best:.0f} tok/s  ({best*1e3:.2f} ms/tok, "
        f"weights {n_bytes/2**30:.2f} GiB, {cfg.n_layer} layers)",
        flush=True,
    )
    del params, f, out, emb
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=128)
    args = ap.parse_args()

    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from omnimamba_tpu.config import Mamba2LayerConfig, MambaConfig

    full = MambaConfig()  # 1.3B, d=2048, 48L
    half = dataclasses.replace(full, n_layer=24)
    tiny_mixer = Mamba2LayerConfig(
        d_model=256, d_state=128, headdim=64, expand=2,
        chunk_size=full.mixer.chunk_size,
    )
    tiny = dataclasses.replace(full, d_model=256, mixer=tiny_mixer)

    t_full = measure(full, args.tokens, "1.3B 48L int8", True)
    t_half = measure(half, args.tokens, "0.65B 24L int8", True)
    t_tiny = measure(tiny, args.tokens, "d=256 48L bf16", False)

    bw = 819e9  # v5e HBM
    bytes_full = 1.55e9  # int8 weights+scales read per token (approx)
    lat_per_layer = t_tiny / 48
    model_floor = 48 * lat_per_layer + bytes_full / bw
    print(
        f"\nanalysis: per-layer latency ≈ {lat_per_layer*1e6:.0f} µs "
        f"(from the tiny-geometry run)\n"
        f"48L latency floor ≈ {48*lat_per_layer*1e3:.2f} ms/tok; "
        f"+ int8 bytes {bytes_full/bw*1e3:.2f} ms -> "
        f"composite floor ≈ {model_floor*1e3:.2f} ms/tok "
        f"({1.0/model_floor:.0f} tok/s)\n"
        f"measured 1.3B: {t_full*1e3:.2f} ms/tok ({1.0/t_full:.0f} tok/s); "
        f"half-depth: {t_half*1e3:.2f} ms/tok",
        flush=True,
    )


if __name__ == "__main__":
    main()
