"""Multimodal-understanding (VQA) inference CLI — mirrors the reference
``scripts/inference_mmu.py``: phi1.5 conversation wrap, DinoSigLIP features
spliced after [<|mmu|> <|soi|>], greedy decode to <|endoftext|>.

Usage:
    python scripts/inference_mmu.py --image_path img.jpg \
        --question "What is in this image? *** How many dogs?" \
        [--ckpt ckpts/OmniMamba-1.3b.pth] [--max-length 2048]
"""

import argparse
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Run MMU inference with OmniMamba.")
    parser.add_argument("--image_path", type=str, required=True)
    parser.add_argument("--question", type=str, required=True)
    parser.add_argument("--config", type=str, default="config/config_stage2.yaml")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--max-length", type=int, default=2048)
    parser.add_argument("--no-merge-lora", action="store_true",
                        help="keep LoRA unmerged (default merges the task's "
                        "adapters into in_proj for faster decode)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force jax platform (e.g. cpu for smoke runs)")
    parser.add_argument(
        "--speculative", type=str, default=None,
        help="single-stream speedup, stream-identical: 'int8' (quantized "
        "self-draft), 'shallow:<M>' (first M layers draft), or 'ngram' "
        "(prompt-lookup drafting — no draft model, zero-cost floor)",
    )
    parser.add_argument("--k-draft", type=int, default=8)
    parser.add_argument("--repetition-penalty", type=float, default=1.0,
                        help="CTRL penalty over prompt+generated tokens "
                             "(reference generate kwarg; 1.0 = off)")
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
    from PIL import Image

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.data.conversation import conv_templates
    from omnimamba_tpu.data.transforms import dinosiglip_transform
    from omnimamba_tpu.factory import build_model
    from omnimamba_tpu.models.omnimamba import mmu_generate, mmu_image_features
    from omnimamba_tpu.ops.sampling import SampleParams

    if os.path.exists(args.config):
        cfg = TrainConfig.from_yaml(args.config)
    else:
        cfg = TrainConfig()
    if args.ckpt:
        cfg.omnimamba_ckpt = args.ckpt
    cfg.t2i_task = cfg.t2i_task  # keep; t2i extras allowed
    model, params, uni = build_model(cfg, stage="inference", dtype=jnp.bfloat16)
    if not args.no_merge_lora and model.cfg.lora is not None:
        # fold the mmu LoRA into in_proj (reference merge_weights analog,
        # lora.py:166-246): same math, fewer per-step matmuls (bf16: one
        # weight-level rounding vs activation-level — rounding-scale only)
        from omnimamba_tpu.utils.lora import merge_lora

        params = merge_lora(params, "mmu", model.cfg.lora)

    image = Image.open(args.image_path).convert("RGB")
    raw = jnp.asarray(np.asarray(image, np.uint8))[None]
    pixel_values = dinosiglip_transform(raw, model.vision_cfg)
    feats = mmu_image_features(params, model, pixel_values)

    spec_kw = {}
    if args.speculative == "int8":
        from omnimamba_tpu.ops.quant import quantize_decode_params

        spec_kw = {"draft_params": quantize_decode_params(params),
                   "k_draft": args.k_draft}
    elif args.speculative and args.speculative.startswith("shallow:"):
        spec_kw = {"draft_layers": int(args.speculative.split(":")[1]),
                   "k_draft": args.k_draft}
    elif args.speculative == "ngram":
        spec_kw = {"draft_mode": "ngram", "k_draft": args.k_draft}
    elif args.speculative:
        raise SystemExit(f"unknown --speculative mode {args.speculative!r}")

    sp = uni.sptids_dict
    eos = int(uni.text_tokenizer.eos_token_id)
    generated_texts = []
    for question in args.question.split(" *** "):
        conv = conv_templates["phi1.5"].copy()
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt().strip()
        ids = list(uni.text_tokenizer(prompt)["input_ids"])
        input_ids = np.asarray(
            [[sp["<|mmu|>"], sp["<|soi|>"], sp["<|eoi|>"], sp["<|sot|>"]] + ids],
            np.int32,
        )
        out = mmu_generate(
            params,
            model,
            jnp.asarray(input_ids),
            feats,
            max_length=args.max_length,
            sample=SampleParams(top_k=1, repetition_penalty=args.repetition_penalty),
            eos_token_id=eos,
            **spec_kw,
        )
        n = int(out.num_generated)
        gen_ids = np.asarray(out.sequences)[0, input_ids.shape[1] + feats.shape[1] :][:n]
        generated_texts.append(uni.text_tokenizer.decode(gen_ids, skip_special_tokens=True))
    print(generated_texts)


if __name__ == "__main__":
    main()
