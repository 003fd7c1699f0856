"""Build the pretokenized T2I corpus: raw COCO -> VQ-16 tokens JSONL.

The reference trains from ``datasets/pretokenized_coco_train2014.jsonl``
(config_stage2.yaml:12) but ships no tool to produce it. This closes the
loop: images are center-cropped to 256px, VQ-16-encoded in batches on the
accelerator, and written as {"captions": [...], "tokens": [256 ids]} rows —
the exact schema of util/coco_dataset.py:114-136 (and of the native reader).

Usage:
    python scripts/pretokenize_coco.py \
        --image-root datasets/coco/train2014 \
        --ann datasets/coco/annotations/captions_train2014.json \
        --vq-ckpt vq_ds16_t2i.pt --out pretokenized_coco_train2014.jsonl \
        [--batch 64] [--limit N]
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image-root", required=True)
    parser.add_argument("--ann", required=True, help="COCO captions annotation JSON")
    parser.add_argument("--vq-ckpt", default=None, help=".pt/.npz VQ weights (random if absent)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--limit", type=int, default=0)
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

    from omnimamba_tpu.config import VQConfig
    from omnimamba_tpu.data.coco import MSCOCODatabase
    from omnimamba_tpu.models.vq import init_vq, vq_encode
    from omnimamba_tpu.utils import convert

    vq_cfg = VQConfig()
    if args.vq_ckpt and args.vq_ckpt.endswith((".pt", ".pth", ".bin")):
        params = jax.tree.map(
            jnp.asarray, convert.convert_vq(convert.load_torch_state_dict(args.vq_ckpt), vq_cfg)
        )
    elif args.vq_ckpt:  # npz
        from omnimamba_tpu.utils.checkpoint import load_params_npz

        template = init_vq(jax.random.PRNGKey(0), vq_cfg)
        params = jax.tree.map(jnp.asarray, load_params_npz(args.vq_ckpt, template))
    else:
        print("[warn] no --vq-ckpt: encoding with RANDOM VQ weights", file=sys.stderr)
        params = init_vq(jax.random.PRNGKey(0), vq_cfg)

    ds = MSCOCODatabase(args.image_root, args.ann, size=args.size)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    encode = jax.jit(lambda p, x: vq_encode(p, x, vq_cfg).indices)

    written = 0
    with open(args.out, "w") as f:
        for start in range(0, n, args.batch):
            idxs = range(start, min(start + args.batch, n))
            imgs, caps = zip(*(ds[i] for i in idxs))
            batch = np.stack(imgs)
            if batch.shape[0] < args.batch:  # keep shapes static
                pad = np.repeat(batch[-1:], args.batch - batch.shape[0], axis=0)
                batch = np.concatenate([batch, pad])
            tokens = np.asarray(encode(params, jnp.asarray(batch)))[: len(idxs)]
            for t, c in zip(tokens, caps):
                f.write(json.dumps({"captions": c, "tokens": t.reshape(-1).tolist()}) + "\n")
                written += 1
            print(f"\r{written}/{n}", end="", file=sys.stderr)
    print(f"\nwrote {written} rows to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
