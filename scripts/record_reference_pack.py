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

import sys

if __name__ == "__main__":
    sys.exit(
        "This script documents the reference-side recording procedure; run "
        "it on a machine with the torch reference + checkpoints (see the "
        "module docstring). The consumer side (load_pack/compare_to_pack) "
        "lives in omnimamba_tpu/eval/fidelity.py and is tested offline."
    )
