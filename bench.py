"""Benchmark: OmniMamba-1.3B T2I serving throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric, plus an "extra" dict carrying the other driver-visible
axes (CFG T2I img/s, MMU batched + single-stream tok/s) so round-over-round
regressions on the weak axes are visible in BENCH_r*.json, not just stderr.
Baseline target (BASELINE.md): >= 5 images/sec/chip @256px (16x16 VQ grid).

The measured pipeline is the full T2I path of scripts/inference_t2i.py:
72-token caption prefill -> 256 greedy decode steps through all 48 layers
(one jitted while_loop, constant-memory recurrent state) -> VQ-16 decode to
256px. Random weights (zero-egress env), bf16 activations, serving batch.
The CFG metric runs guidance ON (scale 7.5, dual cond/uncond streams,
top-k sampling, one draw per image) — the honest quality-mode throughput.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    """Reliable device sync: jax.block_until_ready can return early on the
    experimental axon platform, so fetch a scalar to the host instead."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.ravel()[-1])


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from omnimamba_tpu.config import MambaConfig, VisionConfig, VQConfig
    from omnimamba_tpu.models.backbone import init_backbone, embed_text
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.models.omnimamba import OmniMambaModel, t2i_generate
    from omnimamba_tpu.models.vq import init_vq
    from omnimamba_tpu.ops.sampling import SampleParams

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = MambaConfig()  # 1.3B: d=2048, 48 layers
    vq_cfg = VQConfig()
    model = OmniMambaModel(cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=vq_cfg, sptids={})

    t0 = time.time()
    params = {
        "mamba": init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        "vq": init_vq(jax.random.PRNGKey(1), vq_cfg, dtype=jnp.bfloat16),
    }
    n_params = sum(x.size for x in jax.tree.leaves(params["mamba"]))
    log(f"init {n_params/1e9:.2f}B params in {time.time()-t0:.0f}s")

    B = 48  # serving batch per chip (sweep with auto bf16 state: 10.1
    # img/s at 48, 10.3 at 64 — and the reference's own per-GPU t2i train
    # batch, config_stage2.yaml)
    rng = np.random.default_rng(0)
    text_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 72)), jnp.int32)

    gen = jax.jit(
        lambda p, ids: t2i_generate(
            p, model, ids, sample=SampleParams(top_k=1), decode_image=True
        )[0]
    )
    t0 = time.time()
    imgs = gen(params, text_ids)
    sync(imgs)
    log(f"t2i compile+first run: {time.time()-t0:.0f}s, imgs {imgs.shape}")

    times = []
    for _ in range(3):
        t0 = time.time()
        imgs = gen(params, text_ids)
        sync(imgs)
        times.append(time.time() - t0)
    dt = min(times)
    ips = B / dt
    log(f"T2I: {dt*1e3:.0f} ms/batch of {B} -> {ips:.2f} img/s/chip")

    # secondary: MMU decode throughput (batch=serving, 64 prompt + 256 new)
    L0, T = 64, 256
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L0)), jnp.int32)
    emb = embed_text(params["mamba"], ids, jnp.bfloat16)
    mmu = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + T, sample=SampleParams(top_k=1),
        ).sequences
    )
    out = mmu(params["mamba"], ids, emb)
    sync(out)
    t0 = time.time()
    out = mmu(params["mamba"], ids, emb)
    sync(out)
    dt_mmu = time.time() - t0
    tps = B * T / dt_mmu
    log(f"MMU decode: {tps:.0f} tok/s/chip (batch {B}, target >=1000)")

    # secondary: int8 weight-only serving path (T2I + MMU). fuse_in_proj
    # collapses the four in_proj column-slice matmuls into one operand per
    # layer (serving-only; numerics-identical, tests/test_quant.py) —
    # fewer dispatches per decode step.
    from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params

    qparams = fuse_in_proj(quantize_decode_params(params))
    imgs = gen(qparams, text_ids)
    sync(imgs)
    t0 = time.time()
    imgs = gen(qparams, text_ids)
    sync(imgs)
    ips_q = B / (time.time() - t0)
    log(f"T2I int8: {ips_q:.2f} img/s/chip (batch {B})")

    emb_q = embed_text(qparams["mamba"], ids, jnp.bfloat16)
    out = mmu(qparams["mamba"], ids, emb_q)
    sync(out)
    t0 = time.time()
    out = mmu(qparams["mamba"], ids, emb_q)
    sync(out)
    tps_q = B * T / (time.time() - t0)
    log(f"MMU decode int8: {tps_q:.0f} tok/s/chip (batch {B})")

    # single-stream latency (B=1): int8 weights run AT the bf16-weight
    # bandwidth floor (~3.5 ms/tok); bf16 is ~5 ms/tok
    ids1 = ids[:1]
    emb1 = embed_text(qparams["mamba"], ids1, jnp.bfloat16)
    mmu1 = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + T, sample=SampleParams(top_k=1),
        ).sequences
    )
    out = mmu1(qparams["mamba"], ids1, emb1)
    sync(out)
    t0 = time.time()
    out = mmu1(qparams["mamba"], ids1, emb1)
    sync(out)
    tps_1 = T / (time.time() - t0)
    log(f"MMU decode single-stream int8: {tps_1:.0f} tok/s")

    # best-known serving config: B=96, int8 weights + bf16 SSM state
    # (sweep: 2990 at 64, 3067 at 96, 2079 at 128 — HBM pressure past 96)
    B2 = 96
    ids2 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B2, L0)), jnp.int32)
    emb2 = embed_text(qparams["mamba"], ids2, jnp.bfloat16)
    mmu_best = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + T, sample=SampleParams(top_k=1),
            cache_dtype=jnp.bfloat16,
        ).sequences
    )
    out = mmu_best(qparams["mamba"], ids2, emb2)
    sync(out)
    t0 = time.time()
    out = mmu_best(qparams["mamba"], ids2, emb2)
    sync(out)
    tps_best = B2 * T / (time.time() - t0)
    log(f"MMU decode best (B={B2}, int8+bf16-state): {tps_best:.0f} tok/s/chip")

    # CFG T2I: guidance ON (scale 7.5, [cond; uncond] dual streams, top-k
    # sampling with one draw per image), int8 weights — the quality-mode
    # serving config. BASELINE gate reads "CFG-capable sampler, >=5 img/s".
    n_cfg = 48
    cond = rng.integers(0, cfg.vocab_size, (n_cfg, 72))
    ids_cfg = jnp.asarray(
        np.concatenate([cond, np.tile(cond[:1], (n_cfg, 1))]), jnp.int32
    )
    gen_cfg = jax.jit(
        lambda p, i: t2i_generate(
            p, model, i, cfg_scale=7.5,
            sample=SampleParams(top_k=2, temperature=1.0),
            key=jax.random.PRNGKey(0), decode_image=True,
        )[0]
    )
    imgs = gen_cfg(qparams, ids_cfg)
    sync(imgs)
    t0 = time.time()
    imgs = gen_cfg(qparams, ids_cfg)
    sync(imgs)
    ips_cfg = n_cfg / (time.time() - t0)
    log(f"T2I CFG 7.5 dual-stream int8: {ips_cfg:.2f} img/s/chip ({n_cfg} imgs)")

    # train-step throughput (1.3B t2i B=8, trainer auto-remat -> proj_ssd):
    # driver-visible so MFU regressions show in BENCH_r*.json. Guarded — a
    # failure here must not cost the headline metric. Program is in the
    # persistent compile cache after any profile_train/train run; a cold
    # cache costs one ~7 min compile.
    train_ms = train_mfu = None
    try:
        # free the serving params first — train state (bf16 params + adamw
        # moments + step working set) needs most of the 16G HBM
        del params, qparams, imgs, out, emb, emb_q, emb1, emb2, ids_cfg
        import gc

        gc.collect()
        from omnimamba_tpu.config import TrainConfig
        from omnimamba_tpu.models.omnimamba import init_omnimamba
        from omnimamba_tpu.train.trainer import create_train_state, make_train_step

        tcfg = TrainConfig(stage="finetune", t2i_task=True, mmu_task=False)
        # t2i-only model (as scripts/profile_train.py): with the mmu task
        # branches included, params + adamw moments push the step's compile
        # past the 15.75G HBM budget (measured: 16.58G wanted)
        tcfg_model = MambaConfig(mmu_task=False)
        tmodel = OmniMambaModel(
            cfg=tcfg_model, vision_cfg=VisionConfig(), vq_cfg=vq_cfg, sptids={}
        )
        tparams = init_omnimamba(
            jax.random.PRNGKey(0), tmodel, dtype=jnp.bfloat16, with_vq=False
        )
        state, tx = create_train_state(tparams, tcfg)
        step_fn = make_train_step(tmodel, tx, tcfg, dtype=jnp.bfloat16)
        tb = {
            "t2i_flow": {
                "inputs": jnp.asarray(rng.integers(0, 16384, (8, 256)), jnp.int32),
                "caption_ids": jnp.asarray(
                    rng.integers(0, cfg.vocab_size, (8, 73)), jnp.int32
                ),
            }
        }
        tkey = jax.random.PRNGKey(1)
        state, m = step_fn(state, tb, tkey)
        sync(m)
        t0 = time.time()
        for _ in range(3):
            state, m = step_fn(state, tb, tkey)
        sync(m)
        dt_tr = (time.time() - t0) / 3
        n_tr = sum(x.size for x in jax.tree.leaves(tparams["mamba"]))
        train_ms = dt_tr * 1e3
        train_mfu = 6 * n_tr * 8 * 329 / dt_tr / 197e12 * 100
        log(f"train step B=8: {train_ms:.0f} ms  MFU {train_mfu:.1f}%")
    except Exception as e:  # noqa: BLE001
        log(f"train-step bench skipped: {e!r}")

    print(
        json.dumps(
            {
                "metric": "t2i_images_per_sec_per_chip_256px",
                "value": round(ips, 3),
                "unit": "img/s",
                "vs_baseline": round(ips / 5.0, 3),
                "extra": {
                    "t2i_cfg_images_per_sec": round(ips_cfg, 3),
                    "t2i_int8_images_per_sec": round(ips_q, 3),
                    "mmu_tok_per_sec_b48_int8": round(tps_q, 1),
                    "mmu_tok_per_sec_best": round(tps_best, 1),
                    "mmu_tok_per_sec_b1_int8": round(tps_1, 1),
                    "train_step_ms_b8": None if train_ms is None else round(train_ms, 1),
                    "train_mfu_pct": None if train_mfu is None else round(train_mfu, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
