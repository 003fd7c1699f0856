"""Profile the 1.3B t2i training step on the real TPU chip.

Modes:
  python scripts/profile_train.py step   [--batch 8] [--trace DIR] [--mmu]
  python scripts/profile_train.py ssd    [--batch 8] [--seqlen 1280]

``step`` builds the full t2i-only train step (pallas_ad + remat, as
trainer.py selects on TPU), times steady-state steps, and optionally
captures a jax.profiler trace for an op-level breakdown. ``--mmu`` builds
the reference's stage-2 MIXED shape instead (config_stage2.yaml per-GPU:
t2i B=6 + one mmu row spliced to 1182 tokens, DinoSigLIP towers frozen) —
per-flow remat resolution (t2i keeps proj_ssd/proj_xbd, mmu full remat)
is what trainer.loss_fn does with remat="proj".

``ssd`` microbenches ssd_pallas_ad fwd+bwd alone at 1.3B head geometry
(H=64, P=64, N=128, ngroups=1) and prints achieved TFLOP/s so kernel work
can be judged against the v5e ~197 TFLOP/s bf16 peak.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.ravel()[-1])


def setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/omnimamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    return jax


def bench_step(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from omnimamba_tpu.config import MambaConfig, TrainConfig, VQConfig, VisionConfig
    from omnimamba_tpu.models.omnimamba import OmniMambaModel, init_omnimamba
    from omnimamba_tpu.train.trainer import create_train_state, make_train_step

    import dataclasses

    cfg = MambaConfig(mmu_task=args.mmu)
    mixer_kw = {}
    if args.chunk:
        mixer_kw["chunk_size"] = args.chunk
    if args.bwd_head_tile:
        mixer_kw["bwd_head_tile"] = args.bwd_head_tile
    if mixer_kw:
        cfg = dataclasses.replace(
            cfg, mixer=dataclasses.replace(cfg.mixer, **mixer_kw)
        )
    from omnimamba_tpu.data.tokenizer import default_sptids

    # real special-token ids: the mmu flow's loss wraps input_ids with
    # <|mmu|>/<|soi|>/<|eoi|>/<|sot|> (KeyError with an empty dict)
    model = OmniMambaModel(cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=VQConfig(),
                           sptids=default_sptids())
    remat = False if args.no_remat else (args.remat_policy or "proj")
    tcfg = TrainConfig(stage="finetune", t2i_task=True, mmu_task=args.mmu,
                       scan_impl=args.scan_impl, remat=remat,
                       remat_mmu=args.remat_mmu)

    t0 = time.time()
    params = init_omnimamba(jax.random.PRNGKey(0), model, dtype=jnp.bfloat16, with_vq=False)
    n_params = sum(x.size for x in jax.tree.leaves(params["mamba"]))
    print(f"init {n_params/1e9:.3f}B params in {time.time()-t0:.0f}s", file=sys.stderr)

    state, tx = create_train_state(params, tcfg)
    step_fn = make_train_step(model, tx, tcfg, dtype=jnp.bfloat16)

    # default batch: 6 for the mixed shape (reference per-GPU t2i batch
    # at stage 2), 8 for t2i-only; an explicit --batch always wins
    B = args.batch if args.batch is not None else (6 if args.mmu else 8)
    rng = np.random.default_rng(0)
    batch = {
        "t2i_flow": {
            "inputs": jnp.asarray(rng.integers(0, 16384, (B, 256)), jnp.int32),
            "caption_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 73)), jnp.int32),
        }
    }
    if args.mmu:
        # reference stage-2 per-GPU mmu shape: one 449-text-token row,
        # spliced to 4 + 729 + 449 = 1182 positions (config_stage2.yaml)
        side = model.vision_cfg.dino.img_size
        batch["mmu_flow"] = {
            "pixel_values": {
                "dino": jnp.asarray(
                    rng.normal(size=(1, side, side, 3)), jnp.float32
                ),
                "siglip": jnp.asarray(
                    rng.normal(size=(1, side, side, 3)), jnp.float32
                ),
            },
            "input_ids": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (1, 449)), jnp.int32
            ),
            "labels": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (1, 449)), jnp.int32
            ),
            "multimodal_mask": jnp.asarray([True]),
        }
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    sync(metrics)
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)

    # steady state
    n = args.iters
    t0 = time.time()
    for _ in range(n):
        state, metrics = step_fn(state, batch, key)
    sync(metrics)
    dt = (time.time() - t0) / n
    tokens = B * 329 + (1182 if args.mmu else 0)
    # fwd 2NF + bwd 4NF (+ remat ~2NF not counted: MFU convention counts
    # only the mathematically required FLOPs). Mixed mode counts the mmu
    # row's 1182 spliced LM positions; the frozen vision forward (2NF,
    # no backward) is excluded, so mixed MFU is slightly understated.
    flops = 6 * n_params * tokens
    mfu = flops / dt / 197e12
    shape = f"t2i b={B} + mmu 1182tok" if args.mmu else f"b={B} L=329"
    print(
        f"STEP {shape} {dt*1e3:.1f} ms/step  {tokens/dt:.0f} tok/s  "
        f"MFU(6NT/197T)={mfu*100:.1f}%",
    )

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            state, metrics = step_fn(state, batch, key)
        sync(metrics)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)


def bench_ssd(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
    from omnimamba_tpu.ops.ssd_pallas_bwd import ssd_pallas_ad

    B, L = (args.batch if args.batch is not None else 8), args.seqlen
    H, P, N, G = 64, 64, 128, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, H, P)), jnp.bfloat16)
    dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, L, H)), jnp.float32)
    A = -jnp.asarray(rng.uniform(1, 16, (H,)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, L, G, N)), jnp.bfloat16)
    Cm = jnp.asarray(rng.standard_normal((B, L, G, N)), jnp.bfloat16)
    D = jnp.asarray(rng.standard_normal((H,)), jnp.float32)

    impl = {"pallas_ad": ssd_pallas_ad, "chunked": ssd_chunked}[args.scan_impl]

    kw = {}
    if args.scan_impl == "pallas_ad":
        if args.head_tile:
            kw["head_tile"] = args.head_tile
        if args.chunk:
            kw["chunk_size"] = args.chunk
    elif args.chunk:
        kw["chunk_size"] = args.chunk

    def loss(x, dt, A, Bm, Cm, D):
        y, st = impl(x, dt, A, Bm, Cm, D, **kw)
        return (
            jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(st ** 2),
        )[0]

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))

    def fwd_fn(*a):
        return impl(*a, **kw)[0]

    # per-op dispatch via the tunnel costs ~10 ms — host-side call loops
    # measure dispatch, not the kernel. Loop on-device inside one jit.
    from omnimamba_tpu.utils.profiling import bench_compiled

    t0 = time.time()
    dt_both = bench_compiled(grad_fn, x, dt, A, Bm, Cm, D, loops=args.iters)
    print(f"bwd compile+bench: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    dt_fwd = bench_compiled(fwd_fn, x, dt, A, Bm, Cm, D, loops=args.iters)
    print(f"fwd compile+bench: {time.time()-t0:.1f}s", file=sys.stderr)

    # honest padded-work accounting at the chunk the call actually used
    Q = kw.get("chunk_size", 256 if args.scan_impl == "pallas_ad" else 128)
    Lp = -(-L // Q) * Q
    # fwd MACs/token-head: intra attn (Q*N scores/H-share + Q*P apply) +
    # state build/apply (2*P*N)
    macs_fwd = B * Lp * H * (P * Q + 2 * P * N + Q * N // G // H)
    tf_fwd = 2 * macs_fwd / dt_fwd / 1e12
    tf_bwd = 3 * 2 * macs_fwd / max(dt_both - dt_fwd, 1e-9) / 1e12
    print(
        f"SSD {args.scan_impl} B={B} L={L} Q={Q} ht={args.head_tile}: "
        f"fwd {dt_fwd*1e3:.3f} ms ({tf_fwd:.1f} TF/s)  "
        f"fwd+bwd {dt_both*1e3:.3f} ms  "
        f"(bwd-only {1e3*(dt_both-dt_fwd):.3f} ms, ~{tf_bwd:.1f} TF/s at 3x fwd flops)"
    )

    if args.trace:
        jax.profiler.start_trace(args.trace)
        g = grad_fn(x, dt, A, Bm, Cm, D)
        sync(g)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)


def bench_decode(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from omnimamba_tpu.config import MambaConfig
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams

    cfg = MambaConfig()
    if args.d_state:
        # VERDICT r3 item 8: batched decode is SSM-state-traffic bound
        # (B=32 bf16 state reads+writes 6.4 GB/step vs 2.9 GB weights);
        # d_state=64 halves that traffic. Random weights — throughput only,
        # to price the "retrain with smaller state" trade.
        import dataclasses

        cfg = dataclasses.replace(
            cfg, mixer=dataclasses.replace(cfg.mixer, d_state=args.d_state)
        )
    t0 = time.time()
    params = init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.merge_lora:
        # fold the task's LoRA into in_proj: removes 1 + 4 tiny matmuls per
        # layer per decode step (the task is fixed here)
        from omnimamba_tpu.utils.lora import merge_lora

        params = merge_lora(params, "mmu", cfg.lora)
    if args.int8:
        from omnimamba_tpu.ops.quant import quantize_decode_params

        params = quantize_decode_params(params)
    print(f"init in {time.time()-t0:.0f}s", file=sys.stderr)

    B = args.batch if args.batch is not None else 8
    T = args.tokens
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 8)), jnp.int32)

    cache_dtype = "int8" if args.state_int8 else "auto"

    def run(p, ids):
        emb = embed_text(p, ids, jnp.bfloat16)
        out = generate(
            p, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
            max_length=8 + T, sample=SampleParams(top_k=1),
            cache_dtype=cache_dtype,
        )
        return out.sequences

    f = jax.jit(run)
    t0 = time.time()
    seq = f(params, ids)
    sync(seq)
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(args.iters):
        seq = f(params, ids)
    sync(seq)
    dt = (time.time() - t0) / args.iters
    print(
        f"DECODE B={B} {'int8' if args.int8 else 'bf16'}: "
        f"{B*T/dt:.0f} tok/s  ({dt/T*1e3:.2f} ms/step)"
    )
    if args.trace:
        jax.profiler.start_trace(args.trace)
        seq = f(params, ids)
        sync(seq)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["step", "ssd", "decode"])
    p.add_argument("--batch", type=int, default=None,
                   help="default: 6 with --mmu (stage-2 shape), else 8")
    p.add_argument("--seqlen", type=int, default=1280)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--head-tile", type=int, default=0)
    p.add_argument("--bwd-head-tile", type=int, default=0)
    p.add_argument("--scan-impl", default="pallas_ad")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-policy", default=None, help="e.g. 'dots'")
    p.add_argument("--mmu", action="store_true",
                   help="stage-2 MIXED shape: t2i B + one 1182-tok mmu row")
    p.add_argument("--state-int8", action="store_true",
                   help="decode mode: carry the SSM state as scaled int8 "
                   "(halves the bf16 state traffic again)")
    p.add_argument("--merge-lora", action="store_true",
                   help="decode mode: fold task LoRA into in_proj first")
    p.add_argument("--remat-mmu", default=None,
                   help="mmu-flow remat override (default: full remat)")
    p.add_argument("--chunk", type=int, default=0)
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--d-state", type=int, default=0,
                   help="decode mode: override mixer d_state (e.g. 64)")
    p.add_argument("--trace", default=None)
    args = p.parse_args()
    if args.mode == "step":
        bench_step(args)
    elif args.mode == "decode":
        bench_decode(args)
    else:
        bench_ssd(args)


if __name__ == "__main__":
    main()
