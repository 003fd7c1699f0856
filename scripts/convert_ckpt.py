"""Convert reference PyTorch checkpoints to the framework's flat .npz.

Handles the three checkpoint kinds the reference loads
(``omnimamba.py:88-103``):

    # full OmniMamba (flat .pth from scripts/inference_*.py)
    python scripts/convert_ckpt.py --kind omnimamba \
        --in ckpts/OmniMamba-1.3b.pth --out omnimamba_1p3b.npz

    # LlamaGen VQ tokenizer
    python scripts/convert_ckpt.py --kind vq --in vq_ds16_t2i.pt --out vq16.npz

    # Mamba-2 LM pretrain (non-strict; LoRA/extras keep fresh init)
    python scripts/convert_ckpt.py --kind mamba \
        --in ckpts/mamba2_1.3b/pytorch_model.bin --out mamba_lm.npz

The .npz loads via ``factory.build_model(TrainConfig(omnimamba_ckpt=...))``
or ``utils/checkpoint.load_params_npz``.
"""

import argparse
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--kind", required=True, choices=["omnimamba", "vq", "mamba", "inception"]
    )
    parser.add_argument("--in", dest="inp", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--model", default="OmniMamba-1.3B")
    parser.add_argument(
        "--inception-variant", default=None, choices=[None, "fid", "torchvision"],
        help="override the fc-head auto-detection for --kind inception",
    )
    args = parser.parse_args()

    if args.kind == "inception":
        # FID feature extractor: folded-BN npz with the __variant__ marker
        # that eval/inception.inception_features requires
        from omnimamba_tpu.eval.inception import save_inception_npz

        variant = save_inception_npz(args.inp, args.out, args.inception_variant)
        print(f"wrote {args.out} (variant={variant})")
        return

    from omnimamba_tpu.config import MODEL_REGISTRY, VQConfig
    from omnimamba_tpu.data.tokenizer import GPT_NEOX_BASE_VOCAB
    from omnimamba_tpu.utils import convert
    from omnimamba_tpu.utils.checkpoint import save_params_npz

    sd = convert.load_torch_state_dict(args.inp)
    print(f"loaded {len(sd)} tensors from {args.inp}")

    if args.kind == "vq":
        params = convert.convert_vq(sd, VQConfig())
    else:
        cfg = MODEL_REGISTRY[args.model]()
        cfg = cfg.resized(GPT_NEOX_BASE_VOCAB + 10)  # 50287 -> 50288
        if args.kind == "omnimamba":
            params = convert.convert_omnimamba_checkpoint(sd, cfg)
        else:
            params = {"mamba": convert.convert_mamba_lm(sd, cfg)}

    save_params_npz(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
