"""Record a reference-side fidelity pack (run on a machine WITH the torch
reference + its checkpoints; not runnable in this zero-egress image).

Produces the npz schema consumed by ``eval/fidelity.py:load_pack`` /
``compare_to_pack``:

    task        : str ("t2i" | "mmu" | "lm")
    prompt_ids  : (B, L0) int
    stream      : (B, T) greedy sequence incl. prompt
    logits      : (B, K, V) fp32 — first K generated positions
    meta        : json string (ckpt path, dtype, commit, ...)

Reference invocation sketch (upstream hustvl/OmniMamba at its repo root,
cf. scripts/inference_t2i.py:16-45 there):

    model = OmniMamba(config, stage='inference'); model.load_state_dict(
        torch.load('ckpts/OmniMamba-1.3b.pth'), strict=False)
    out = model.llm_backbone.mamba.generate(
        input_ids, ..., top_k=1, max_length=T,
        output_scores=True, return_dict_in_generate=True, task=task)
    np.savez(pack, task=task, prompt_ids=ids, stream=out.sequences,
             logits=torch.stack(out.scores, 1).float().numpy(),
             meta=json.dumps({...}))

Once such a pack exists, run weight-level fidelity here with:

    python - <<'PY'
    import jax.numpy as jnp, sys; sys.path.insert(0, '/root/repo')
    from omnimamba_tpu.eval.fidelity import load_pack, compare_to_pack
    from omnimamba_tpu.factory import build_model
    from omnimamba_tpu.models.backbone import embed_text
    model, params, uni = build_model(cfg, stage='inference')  # + real ckpt
    pack = load_pack('reference_pack.npz')
    emb = embed_text(params['mamba'], jnp.asarray(pack.prompt_ids), jnp.float32)
    print(compare_to_pack(params['mamba'], model.cfg, pack, emb))
    PY
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

REF = "/root/reference"


def record_vq_pack(out_path: str, image_rel: str, size: int) -> None:
    """Record a VQ pack from the ACTUAL reference VQ-16 (r5, VERDICT r4
    item 5): the torch model at ``llamagen_tokenizer/tokenizer_image/
    vq_model.py`` imports and runs on the CPU torch in this image. Weights
    are seeded (``torch.manual_seed(0)``) so the consumer can rebuild the
    identical model deterministically — the real ``vq_ds16_t2i.pt`` swap-in
    needs only a different meta note.
    """
    import os

    import numpy as np
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from llamagen_tokenizer.tokenizer_image.vq_model import VQ_16
    from PIL import Image

    from omnimamba_tpu.eval.fidelity import VQPack, save_vq_pack

    torch.manual_seed(0)
    model = VQ_16()
    model.eval()

    pil = Image.open(os.path.join(REF, image_rel)).convert("RGB").resize(
        (size, size), Image.BICUBIC
    )
    img = (np.asarray(pil, np.float32) / 127.5 - 1.0)[None]
    with torch.no_grad():
        quant, _, info = model.encode(torch.tensor(img.transpose(0, 3, 1, 2)))
        recon = model.decode(quant)
    g = size // 16
    pack = VQPack(
        indices=info[2].numpy().reshape(1, g, g).astype(np.int32),
        recon=recon.numpy().transpose(0, 2, 3, 1).astype(np.float16),
        image_path=image_rel,
        size=size,
        meta={
            "producer": "reference vq_model.py VQ_16, torch.manual_seed(0)",
            "torch": torch.__version__,
            "weights": "seeded-random (swap for vq_ds16_t2i.pt when available)",
        },
    )
    save_vq_pack(out_path, pack)
    print(f"wrote {out_path}: indices {pack.indices.shape}, recon {pack.recon.shape}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--vq", action="store_true", help="record the in-image VQ pack")
    ap.add_argument("--out", default="tests/fixtures/vq_pack_catdog.npz")
    ap.add_argument("--image", default="mmu_validation/cat_dog.png")
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()
    if args.vq:
        record_vq_pack(args.out, args.image, args.size)
    else:
        sys.exit(
            "LM stream packs need the torch reference's mamba_ssm runtime "
            "(not in this image) + real checkpoints; see the module "
            "docstring for the reference-side procedure. The VQ sub-model "
            "IS recordable here: re-run with --vq."
        )
