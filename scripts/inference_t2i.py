"""Text-to-image inference CLI — mirrors ``scripts/inference_t2i.py`` of the
reference (same argv surface): prompt -> 72-token caption block ->
autoregressive 256 VQ tokens -> VQ-16 decode -> image grid jpg.

Usage:
    python scripts/inference_t2i.py --prompt "A photo of a corgi" \
        [--ckpt ckpts/OmniMamba-1.3b.pth] [--config config/config_stage2.yaml] \
        [--cfg-scale 0] [--top-k 1] [--out generated_image.jpg]
"""

import argparse
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Run T2I inference with OmniMamba.")
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--config", type=str, default="config/config_stage2.yaml")
    parser.add_argument("--ckpt", type=str, default=None, help=".pth or .npz weights")
    parser.add_argument("--out", type=str, default="generated_image.jpg")
    parser.add_argument("--top-k", type=int, default=1)
    parser.add_argument("--top-p", type=float, default=0.0)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--cfg-scale", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--no-merge-lora", action="store_true",
                        help="keep LoRA unmerged (default merges the task's "
                        "adapters into in_proj for faster decode)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force jax platform (e.g. cpu for smoke runs)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.data.coco import MAX_CAPTION_TOKENS, NULL_PROMPT
    from omnimamba_tpu.factory import build_model
    from omnimamba_tpu.models.omnimamba import t2i_generate
    from omnimamba_tpu.ops.sampling import SampleParams

    if os.path.exists(args.config):
        cfg = TrainConfig.from_yaml(args.config)
    else:
        cfg = TrainConfig()
    if args.ckpt:
        cfg.omnimamba_ckpt = args.ckpt
    cfg.mmu_task = False  # no vision needed for T2I
    model, params, uni = build_model(cfg, stage="inference", dtype=jnp.bfloat16)
    if not args.no_merge_lora and model.cfg.lora is not None:
        # fold the t2i LoRA into in_proj (reference merge_weights analog,
        # lora.py:166-246): same math, fewer per-step matmuls (bf16: one
        # weight-level rounding vs activation-level — rounding-scale only)
        from omnimamba_tpu.utils.lora import merge_lora

        params = merge_lora(params, "t2i", model.cfg.lora)

    # 72-id caption block (reference scripts/inference_t2i.py:30-45)
    def caption_block(prompt: str) -> np.ndarray:
        ids = np.asarray(uni.text_tokenizer(prompt)["input_ids"], np.int64)
        pad = np.full(MAX_CAPTION_TOKENS, uni.pad_id, np.int64)
        n = min(len(ids), MAX_CAPTION_TOKENS)
        if n:
            pad[-n:] = ids[:n]
        sp = uni.sptids_dict
        return np.concatenate(
            [[sp["<|t2i|>"], sp["<|sot|>"]], pad, [sp["<|eot|>"], sp["<|soi|>"]]]
        )

    text_ids = np.stack([caption_block(args.prompt)] * args.batch)
    cfg_scale = args.cfg_scale if args.cfg_scale > 0 else None
    if cfg_scale is not None:
        uncond = np.stack([caption_block(NULL_PROMPT)] * args.batch)
        text_ids = np.concatenate([text_ids, uncond], axis=0)

    import jax

    imgs, tokens = t2i_generate(
        params,
        model,
        jnp.asarray(text_ids, jnp.int32),
        sample=SampleParams(
            top_k=args.top_k, top_p=args.top_p, temperature=args.temperature
        ),
        key=jax.random.PRNGKey(args.seed),
        cfg_scale=cfg_scale,
    )

    from omnimamba_tpu.data.transforms import from_vq_range

    arr = np.asarray(from_vq_range(imgs))  # (B, 256, 256, 3) uint8
    grid = np.concatenate(list(arr), axis=1) if arr.shape[0] > 1 else arr[0]
    from PIL import Image

    Image.fromarray(grid).save(args.out)
    print(f"saved {args.out} ({arr.shape[0]} image(s)); first tokens:", tokens[0, :8])


if __name__ == "__main__":
    main()
