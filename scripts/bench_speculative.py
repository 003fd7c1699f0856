"""Measure the speculative-decode win on a genuinely repetitive workload.

Random weights produce greedy streams with NO repetition (no cycle in 256
tokens), so prompt-lookup acceptance is 5-6% and speculation costs 10-20%
vs plain decode — the measured negative recorded in README. The lane is
built for streams that echo their context (VQA answers quoting the
question, code, boilerplate — reference decode loop:
/root/reference/models/stage2/generation.py:296-434 has no such lane).

This script makes that workload real instead of hypothetical: it first
teaches the 1.3B model ON-CHIP to reproduce one periodic sequence (adam on
the tied text embedding only — a few hundred steps, the rest of the model
stop_gradient'd), so greedy decode genuinely regenerates the periodic
continuation.  Then it times plain greedy vs prompt-lookup speculative
decode at B=1 and reports acceptance + tok/s + stream identity.

Usage:  python scripts/bench_speculative.py [--period 32] [--k 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--period", type=int, default=32, help="phrase length")
    ap.add_argument("--seqlen", type=int, default=256)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--k", type=int, default=8, help="draft window")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--steps", type=int, default=1500, help="max train steps")
    ap.add_argument("--lr", type=float, default=2e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/omnimamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from omnimamba_tpu.config import MambaConfig, VisionConfig, VQConfig
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.models.omnimamba import OmniMambaModel, lm_loss
    from omnimamba_tpu.models.speculative import speculative_generate
    from omnimamba_tpu.ops.sampling import SampleParams

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = MambaConfig()
    model = OmniMambaModel(
        cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=VQConfig(), sptids={}
    )

    t0 = time.time()
    mamba = init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(mamba))
    print(f"init {n_params/1e9:.2f}B params in {time.time()-t0:.0f}s", file=sys.stderr)

    # periodic sequence: `period`-token phrase repeated — the language shape
    # of an answer that echoes its prompt
    rng = np.random.default_rng(7)
    phrase = rng.integers(0, 50277, args.period)
    seq = np.tile(phrase, -(-args.seqlen // args.period))[: args.seqlen]
    ids = jnp.asarray(seq[None], jnp.int32)  # (1, L)

    # ---- teach the model the sequence: adam on the tied embedding only ----
    emb0 = mamba["embedding"]["kernel"] if isinstance(mamba["embedding"], dict) else mamba["embedding"]
    # (params store the raw table; keep an fp32 master for the update)
    master = jnp.asarray(emb0, jnp.float32)

    def loss_fn(table32, base):
        p = dict(jax.tree.map(jax.lax.stop_gradient, base))
        p["embedding"] = table32.astype(jnp.bfloat16)
        return lm_loss({"mamba": p}, model, ids, ids, scan_impl="pallas_ad")

    tx = optax.adam(args.lr)
    opt = tx.init(master)

    @jax.jit
    def train_step(table32, opt, base):
        l, g = jax.value_and_grad(loss_fn)(table32, base)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(table32, up), opt, l

    @jax.jit
    def tf_accuracy(table32, base):
        """teacher-forced next-token accuracy past the prompt boundary"""
        p = dict(base)
        p["embedding"] = table32.astype(jnp.bfloat16)
        from omnimamba_tpu.models.backbone import apply_head, backbone_forward

        emb = embed_text(p, ids, jnp.bfloat16)
        h, _ = backbone_forward(
            p, emb, "mmu", cfg, add_mmu_pos=False, scan_impl="pallas"
        )
        pred = jnp.argmax(apply_head(p, h, "mmu"), axis=-1)  # (1, L)
        ok = pred[0, args.prompt - 1 : -1] == ids[0, args.prompt :]
        return jnp.mean(ok.astype(jnp.float32))

    t0 = time.time()
    step = 0
    while step < args.steps:
        for _ in range(100):
            master, opt, l = train_step(master, opt, mamba)
            step += 1
        acc = float(tf_accuracy(master, mamba))
        print(
            f"  step {step}: loss {float(l):.4f}  tf-acc(past prompt) {acc:.3f}",
            file=sys.stderr,
        )
        if acc == 1.0:
            break
    print(f"embedding overfit in {step} steps, {time.time()-t0:.0f}s", file=sys.stderr)

    mamba = dict(mamba)
    mamba["embedding"] = master.astype(jnp.bfloat16)

    # ---- plain greedy baseline -------------------------------------------
    L0, T_new = args.prompt, args.seqlen - args.prompt
    pids = ids[:, :L0]
    pemb = embed_text(mamba, pids, jnp.bfloat16)

    plain = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=args.seqlen, sample=SampleParams(top_k=1),
        ).sequences
    )
    out_plain = plain(mamba, pids, pemb)
    sync(out_plain)
    t0 = time.time()
    out_plain = plain(mamba, pids, pemb)
    sync(out_plain)
    dt_plain = time.time() - t0
    stream = np.asarray(out_plain)[0]
    echo_ok = bool((stream[L0:] == seq[L0:]).all())
    print(
        f"plain greedy: {T_new/dt_plain:.0f} tok/s  "
        f"(echoes the periodic continuation: {echo_ok})",
        file=sys.stderr,
    )

    # ---- prompt-lookup speculative ---------------------------------------
    spec = jax.jit(
        lambda p, i, e: speculative_generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=args.seqlen, draft_mode="ngram",
            k_draft=args.k, ngram=args.ngram,
        )
    )
    out = spec(mamba, pids, pemb)
    sync(out.sequences)
    t0 = time.time()
    out = spec(mamba, pids, pemb)
    sync(out.sequences)
    dt_spec = time.time() - t0
    acc_rate = float(out.accepted) / max(float(out.drafted), 1.0)
    identical = bool(
        (np.asarray(out.sequences)[0, : args.seqlen] == stream[: args.seqlen]).all()
    )
    print(
        f"ngram speculative (k={args.k}, n={args.ngram}): "
        f"{T_new/dt_spec:.0f} tok/s  acceptance {acc_rate:.0%}  "
        f"rounds {int(out.rounds)}  stream identical to plain: {identical}",
        file=sys.stderr,
    )
    print(
        f"SPECULATIVE-WIN plain={T_new/dt_plain:.0f} tok/s "
        f"spec={T_new/dt_spec:.0f} tok/s speedup={dt_plain/dt_spec:.2f}x "
        f"acceptance={acc_rate:.0%} echo_ok={echo_ok} identical={identical}"
    )


if __name__ == "__main__":
    main()
