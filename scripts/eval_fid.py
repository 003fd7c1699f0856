"""T2I FID evaluation CLI.

Generates images for N captions through the full T2I pipeline
(prefill -> 256 AR tokens -> VQ decode) and reports FID against a
reference image set. Mirrors the reference's MS-COCO FID protocol
(SURVEY §6: teaser FID 5.5, computed with InceptionV3 features); the
feature extractor is InceptionV3 pool3 when weights are available
($OMNIMAMBA_INCEPTION_WEIGHTS) and the frozen VQ-encoder proxy otherwise
(relative metric only — loudly flagged).

    # self-contained smoke (synthetic captions, reference = real COCO dir
    # or --synthetic-ref random images):
    python scripts/eval_fid.py --num 64 --synthetic-ref --config config/config_stage2.yaml
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--captions", default=None,
                    help="text file, one caption per line (default: synthetic)")
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--ref-dir", default=None, help="reference image directory")
    ap.add_argument("--synthetic-ref", action="store_true",
                    help="random uint8 reference images (pipeline smoke)")
    ap.add_argument("--config", default="config/config_stage2.yaml")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cfg-scale", type=float, default=None)
    ap.add_argument("--out-dir", default=None, help="save generated PNGs here")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.eval.t2i_fid import (
        compute_fid,
        default_features,
        generate_samples,
    )
    from omnimamba_tpu.factory import build_model

    cfg = TrainConfig.from_yaml(args.config) if os.path.exists(args.config) else TrainConfig()
    if args.ckpt:
        cfg.omnimamba_ckpt = args.ckpt
    model, params, uni = build_model(
        cfg, stage="inference", dtype=jnp.bfloat16, with_vision=False
    )

    if args.captions:
        captions = [l.strip() for l in open(args.captions) if l.strip()][: args.num]
    else:
        captions = [
            f"a photo of object {i} on a table, studio lighting" for i in range(args.num)
        ]

    t0 = time.time()
    imgs = generate_samples(
        params, model, uni, captions,
        batch_size=args.batch, cfg_scale=args.cfg_scale, out_dir=args.out_dir,
    )
    gen_s = time.time() - t0
    print(f"[gen] {len(imgs)} images in {gen_s:.0f}s "
          f"({len(imgs)/gen_s:.2f} img/s incl. compile)", file=sys.stderr)

    if args.ref_dir:
        from PIL import Image

        files = sorted(os.listdir(args.ref_dir))[: args.num]
        ref = np.stack([
            np.asarray(
                Image.open(os.path.join(args.ref_dir, f)).convert("RGB").resize((256, 256)),
                np.uint8,
            )
            for f in files
        ])
    elif args.synthetic_ref:
        ref = np.random.default_rng(0).integers(0, 255, imgs.shape, np.uint8)
    else:
        raise SystemExit("--ref-dir or --synthetic-ref required")

    t0 = time.time()
    feature_fn = default_features(params["vq"], model.vq_cfg)
    fid = compute_fid(imgs, ref, feature_fn)
    print(f"[fid] computed in {time.time()-t0:.0f}s", file=sys.stderr)
    print(json.dumps({"fid": float(fid), "num_images": len(imgs)}))


if __name__ == "__main__":
    main()
