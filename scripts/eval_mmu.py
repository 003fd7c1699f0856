"""MMU benchmark CLI: run POPE/GQA/VQAv2 protocols over a JSONL manifest.

Usage:
    python scripts/eval_mmu.py --manifest pope_coco.jsonl --protocol pope \
        [--image-root datasets/coco] [--ckpt weights] [--max-new-tokens 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", default=None)
    parser.add_argument(
        "--synthetic", type=int, default=0,
        help="self-generate N synthetic manifest rows + images (no datasets "
        "needed; exercises the full pipeline end-to-end)",
    )
    parser.add_argument("--protocol", required=True,
                        choices=["pope", "gqa", "vqav2", "mme", "mmmu"])
    parser.add_argument("--image-root", default=".")
    parser.add_argument("--config", default="config/config_stage2.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--max-new-tokens", type=int, default=16)
    parser.add_argument("--out", default=None, help="write predictions JSONL")
    parser.add_argument("--platform", default=None)
    parser.add_argument(
        "--questions-per-image", type=int, default=1,
        help="synthetic mode: questions sharing one image (real POPE asks "
        "~6/image; exercises the cross-batch feature cache realistically)",
    )
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    import jax.numpy as jnp

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.eval.mmu_benchmarks import (
        load_manifest,
        run_vqa_eval,
        score_manifest,
    )
    from omnimamba_tpu.factory import build_model

    if args.synthetic and not args.manifest:
        import numpy as np
        from PIL import Image

        root = "/tmp/omnimamba_synth_eval"
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        rows = []
        qpi = max(args.questions_per_image, 1)
        for i in range(args.synthetic):
            p = os.path.join(root, f"img_{i // qpi:04d}.png")
            if i % qpi == 0:
                img = rng.integers(0, 255, (480, 640, 3), np.uint8)
                Image.fromarray(img).save(p)
            if args.protocol == "mmmu":
                rows.append({
                    "image": p,
                    "question": f"What is shown in the image? (sample {i})",
                    "options": ["a cat", "a dog", "a car", "a tree"],
                    "answer": "ABCD"[i % 4],
                })
            else:
                rows.append({
                    "image": p,
                    "question": f"Is there a cat in the image? (sample {i})",
                    "answer": "yes" if i % 2 == 0 else "no",
                })
        args.manifest = os.path.join(root, "manifest.jsonl")
        with open(args.manifest, "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in rows)
        args.image_root = root
        print(f"[synthetic] {args.synthetic} rows at {args.manifest}")
    assert args.manifest, "--manifest or --synthetic required"

    cfg = TrainConfig.from_yaml(args.config) if os.path.exists(args.config) else TrainConfig()
    if args.ckpt:
        cfg.omnimamba_ckpt = args.ckpt
    model, params, uni = build_model(cfg, stage="inference", dtype=jnp.bfloat16)

    rows = load_manifest(args.manifest)
    t0 = time.time()
    # soak instrumentation (VERDICT r3 item 6): per-segment rows/s exposes
    # drift (a leaking device-feature LRU would slow later segments or OOM)
    seg: list = [(0, t0)]

    def progress(i, n):
        print(f"\r{i}/{n}", end="", file=sys.stderr)
        if i - seg[-1][0] >= 500:
            seg.append((i, time.time()))

    rows = run_vqa_eval(
        params, model, uni, rows,
        image_root=args.image_root, max_new_tokens=args.max_new_tokens,
        multiple_choice=args.protocol == "mmmu",
        progress=progress,
    )
    dt = time.time() - t0
    print(
        f"\n{len(rows)} rows in {dt:.0f}s = {len(rows)/dt:.2f} rows/s "
        "(includes compiles on a cold cache)",
        file=sys.stderr,
    )
    if len(seg) > 1:
        rates = [
            f"{(b[0]-a[0])/max(b[1]-a[1], 1e-9):.2f}"
            for a, b in zip(seg, seg[1:])
        ]
        print(f"segment rows/s (per 500): {' '.join(rates)}", file=sys.stderr)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"peak HBM: {peak/2**30:.2f} GiB", file=sys.stderr)
    except Exception:  # noqa: BLE001 — not all platforms expose stats
        pass
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    print(json.dumps(score_manifest(rows, args.protocol), indent=2))


if __name__ == "__main__":
    main()
