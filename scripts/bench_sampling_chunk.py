"""Price the per-request-sampling chunk vs the greedy chunk at serving scale.

The HTTP continuous lane builds SlotEngine(enable_sampling=True) so payload
temperature/top_k/seed work per request; this measures what that program
costs vs the pure-greedy chunk (same W/K/geometry) on the real chip:

  - greedy engine        : argmax pick (the bench.py lane's program)
  - sampling, all temp=0 : sampling program, every slot on the argmax branch
  - sampling, temp=1 k=64: every slot draws (top_k 64 over the padded vocab
    + vmapped categorical per step)

Usage: python scripts/bench_sampling_chunk.py [--width 16] [--chunk 16]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

    from omnimamba_tpu.config import MambaConfig
    from omnimamba_tpu.models.backbone import init_backbone
    from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params
    from omnimamba_tpu.serve.continuous import SlotEngine

    cfg = MambaConfig()
    t0 = time.time()
    params = fuse_in_proj(quantize_decode_params(
        {"mamba": init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)}
    ))["mamba"]
    print(f"init+quantize {time.time()-t0:.0f}s", flush=True)

    W, K = args.width, args.chunk

    def time_chunk(eng, label):
        # prime slot vectors: active everywhere so the chunk does real work
        eng._tok = jnp.ones((W,), jnp.int32)
        eng._pos = jnp.full((W,), 64, jnp.int32)
        fn = eng._chunk_fn
        argsv = (eng.params, eng._cache, eng._tok, eng._pos,
                 eng._temp, eng._topk, eng._topp, eng._minp, eng._key,
                 eng._hist, eng._cnt, eng._pen)
        out = fn(*argsv)
        np.asarray(out[0].ravel()[-1])  # hard sync (axon)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*argsv)
        np.asarray(out[0].ravel()[-1])
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"{label:28s} chunk({K} steps) {ms:7.2f} ms  "
              f"({W*K/(ms/1e3):.0f} tok/s at W={W})", flush=True)
        return ms

    g = SlotEngine(params, cfg, n_slots=W, chunk=K, task="mmu",
                   dtype=jnp.bfloat16, prefill_bucket=64,
                   state_dtype=jnp.bfloat16)
    base = time_chunk(g, "greedy engine")
    del g

    s = SlotEngine(params, cfg, n_slots=W, chunk=K, task="mmu",
                   dtype=jnp.bfloat16, prefill_bucket=64,
                   state_dtype=jnp.bfloat16, enable_sampling=True)
    t0ms = time_chunk(s, "sampling engine, all temp=0")
    s._temp = jnp.ones((W,), jnp.float32)
    s._topk = jnp.full((W,), 64, jnp.int32)
    s._key = jnp.tile(np.asarray(jax.random.PRNGKey(1), np.uint32)[None], (W, 1))
    t1ms = time_chunk(s, "sampling engine, temp=1 k=64")
    s._topp = jnp.full((W,), 0.9, jnp.float32)
    t2ms = time_chunk(s, "sampling engine, temp=1 p=.9")
    del s

    r = SlotEngine(params, cfg, n_slots=W, chunk=K, task="mmu",
                   dtype=jnp.bfloat16, prefill_bucket=64,
                   state_dtype=jnp.bfloat16, enable_rep_penalty=True,
                   history_len=256)
    r._pen = jnp.full((W,), 1.3, jnp.float32)
    r._cnt = jnp.full((W,), 128, jnp.int32)  # half-full histories
    t3ms = time_chunk(r, "penalty engine, pen=1.3 H=256")
    print(f"overhead vs greedy: temp0 {100*(t0ms/base-1):+.1f}%  "
          f"sampled {100*(t1ms/base-1):+.1f}%  "
          f"top-p {100*(t2ms/base-1):+.1f}%  "
          f"penalty {100*(t3ms/base-1):+.1f}%", flush=True)


if __name__ == "__main__":
    main()
