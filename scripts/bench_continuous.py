"""Continuous vs static batching under mixed-length traffic — 1.3B, one chip.

The static batcher (serve/server.py) decodes EVERY batch to the full
``max_new`` budget: one long request holds its 15 batchmates for the whole
decode, and short requests pay the longest request's latency. The slot
engine (serve/continuous.py) retires each request at ITS length and admits
queued work into the freed slot mid-flight.

Workload: N text-prompt requests (64-token prompts), per-request token
budgets drawn from {32, 64, 128, 256}. Both modes use the same width
(n_slots == static batch) and int8 weights + bf16 state.

Reports completion wall, useful tok/s (sum of per-request budgets / wall),
and p50/p95 request latency for both modes.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--width", type=int, default=16, help="slots / static batch")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arrival-ms", type=float, default=0.0,
                    help="inter-arrival gap: request i arrives at i*gap. "
                         "0 = burst (all at once, static batching's best "
                         "case); >0 = streaming traffic, where the static "
                         "batcher decodes PARTIAL batches (whatever has "
                         "arrived, padded to W) and continuous admits into "
                         "free slots mid-flight. Latency = done - arrival.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

    from omnimamba_tpu.config import MambaConfig
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params
    from omnimamba_tpu.ops.sampling import SampleParams
    from omnimamba_tpu.serve.continuous import SlotEngine

    cfg = MambaConfig()
    t0 = time.time()
    params = fuse_in_proj(
        quantize_decode_params(
            {"mamba": init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)}
        )
    )["mamba"]
    print(f"init+quantize {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(args.seed)
    N, W, L0 = args.requests, args.width, args.prompt_len
    budgets = rng.choice([32, 64, 128, 256], size=N).astype(int)
    prompts = rng.integers(0, cfg.vocab_size, (N, L0)).astype(np.int32)
    max_new = int(budgets.max())
    useful = int(budgets.sum())
    print(f"{N} requests x {L0}-tok prompts, budgets {sorted(set(budgets))}, "
          f"useful tokens {useful}", flush=True)

    # ---- static batcher: W-wide batches, every batch decodes max_new ------
    gen = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + max_new, sample=SampleParams(top_k=1),
            cache_dtype=jnp.bfloat16,
        ).sequences
    )
    # warm compile outside the timed window (both modes get warm programs)
    ids_w = jnp.asarray(prompts[:W])
    emb_w = embed_text(params, ids_w, jnp.bfloat16)
    sync(gen(params, ids_w, emb_w))

    arrivals = np.arange(N) * args.arrival_ms / 1000.0
    lat_static = np.zeros(N)
    t_start = time.time()
    nxt = 0
    while nxt < N:
        now = time.time() - t_start
        if now < arrivals[nxt]:  # batcher idle: wait for the next arrival
            time.sleep(arrivals[nxt] - now)
            now = arrivals[nxt]
        # take everything that has arrived, up to W (the serve._Batcher
        # drain policy); pad partial batches to the fixed program width
        take = 1
        while nxt + take < N and take < W and arrivals[nxt + take] <= now:
            take += 1
        rows = slice(nxt, nxt + take)
        ids = prompts[rows]
        if ids.shape[0] < W:
            ids = np.concatenate([ids, np.tile(ids[-1:], (W - ids.shape[0], 1))])
        ids = jnp.asarray(ids)
        emb = embed_text(params, ids, jnp.bfloat16)
        sync(gen(params, ids, emb))
        lat_static[rows] = time.time() - t_start - arrivals[rows]
        nxt += take
    wall_static = time.time() - t_start
    print(
        f"STATIC  W={W}: wall {wall_static:.2f}s  useful {useful/wall_static:.0f} tok/s  "
        f"p50 {np.percentile(lat_static, 50):.2f}s  p95 {np.percentile(lat_static, 95):.2f}s",
        flush=True,
    )

    # ---- continuous engine -------------------------------------------------
    eng = SlotEngine(
        params, cfg, n_slots=W, chunk=args.chunk, task="mmu",
        dtype=jnp.bfloat16, prefill_bucket=L0, max_new_default=max_new,
        state_dtype=jnp.bfloat16,
    )
    # warm EVERY engine program traffic can hit (chunk + per-width prefill/
    # insert variants) outside the window — cold variants measured 6s->28s
    t0 = time.time()
    eng.warmup([L0])
    emb0 = np.asarray(
        embed_text(params, jnp.asarray(prompts[:1]), jnp.bfloat16), np.float32
    )[0]
    r = eng.submit(emb0, L0, max_new=2)
    eng.run_until_drained()
    print(f"engine warmup {time.time()-t0:.0f}s", flush=True)

    # embeddings prepped up front (the HTTP path embeds per request on
    # arrival; embedding cost is identical for both modes and tiny)
    embs = [
        np.asarray(embed_text(params, jnp.asarray(prompts[i : i + 1]), jnp.bfloat16),
                   np.float32)[0]
        for i in range(N)
    ]
    import threading

    reqs: list = [None] * N
    t_start = time.time()

    def feeder():
        for i in range(N):
            dt_ = t_start + arrivals[i] - time.time()
            if dt_ > 0:
                time.sleep(dt_)
            reqs[i] = eng.submit(embs[i], L0, max_new=int(budgets[i]))

    ft = threading.Thread(target=feeder)
    ft.start()
    done_at = np.zeros(N)
    pending = set(range(N))
    while pending:
        if eng.tick() == 0:  # engine idle: nothing arrived yet
            time.sleep(0.002)
        now = time.time() - t_start
        for i in list(pending):
            if reqs[i] is not None and reqs[i].done.is_set():
                done_at[i] = now - arrivals[i]
                pending.discard(i)
    ft.join()
    wall_cont = time.time() - t_start
    n_tok = sum(len(r.tokens) for r in reqs)
    print(
        f"CONTINUOUS W={W} chunk={args.chunk}: wall {wall_cont:.2f}s  "
        f"useful {n_tok/wall_cont:.0f} tok/s  "
        f"p50 {np.percentile(done_at, 50):.2f}s  p95 {np.percentile(done_at, 95):.2f}s",
        flush=True,
    )
    print(
        f"SPEEDUP: wall {wall_static/wall_cont:.2f}x  "
        f"p50 {np.percentile(lat_static,50)/np.percentile(done_at,50):.2f}x  "
        f"p95 {np.percentile(lat_static,95)/np.percentile(done_at,95):.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
