"""Factory integration: build_model loading a full reference-format
OmniMamba checkpoint (flat torch .pth with llm_backbone.mamba.* +
projector.projector.* keys, as produced by the reference training and
consumed by its inference scripts)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import MODEL_REGISTRY, TrainConfig
from omnimamba_tpu.data.tokenizer import GPT_NEOX_BASE_VOCAB
from omnimamba_tpu.factory import build_model
from tests.test_convert_checkpoint import reference_style_state_dict


def _full_omnimamba_sd(cfg, rng):
    """llm_backbone.mamba.* (MambaLMHeadModel) + projector.projector.*."""
    mamba_sd = reference_style_state_dict(cfg, rng)
    sd = {f"llm_backbone.mamba.{k}": v for k, v in mamba_sd.items()}
    # tied heads also appear in the reference state dict
    sd["llm_backbone.mamba.lm_head.weight"] = mamba_sd["backbone.embedding.weight"]
    sd["llm_backbone.mamba.img_head.weight"] = mamba_sd[
        "backbone.img_embeddings.word_embeddings.weight"
    ]
    # projector: FusedMLP 2176->4*2176->d->d at full scale; tiny vision here
    vdim, d = 128, cfg.d_model
    hidden = vdim * 4
    for j, (din, dout) in [(0, (vdim, hidden)), (2, (hidden, d)), (4, (d, d))]:
        sd[f"projector.projector.{j}.weight"] = rng.normal(size=(dout, din)).astype(np.float32)
        sd[f"projector.projector.{j}.bias"] = rng.normal(size=(dout,)).astype(np.float32)
    return sd


def test_build_model_loads_reference_checkpoint(tmp_path):
    base = MODEL_REGISTRY["OmniMamba-Tiny"]().resized(GPT_NEOX_BASE_VOCAB + 10)
    rng = np.random.default_rng(0)
    sd = _full_omnimamba_sd(base, rng)
    path = str(tmp_path / "omnimamba_tiny.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)

    cfg = TrainConfig(
        omnimamba_model="OmniMamba-Tiny",
        image_backbone="dinosiglip-tiny",
        omnimamba_ckpt=path,
        mmu_task=False,  # tiny vision dims differ from the ckpt's projector
        t2i_task=True,
    )
    model, params, uni = build_model(cfg, stage="inference", with_vq=False)

    # weights actually came from the checkpoint (not random init)
    np.testing.assert_allclose(
        np.asarray(params["mamba"]["embedding"]),
        sd["llm_backbone.mamba.backbone.embedding.weight"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["mamba"]["layers"]["mixer"]["A_log"][0]),
        sd["llm_backbone.mamba.backbone.layers.0.mixer.A_log"],
        rtol=1e-6,
    )

    # and the loaded model generates
    from omnimamba_tpu.models.omnimamba import t2i_generate
    from omnimamba_tpu.ops.sampling import SampleParams

    text_ids = jnp.asarray(rng.integers(0, 100, (1, 12)), jnp.int32)
    _, tokens = t2i_generate(
        params, model, text_ids, sample=SampleParams(top_k=1),
        decode_image=False, dtype=jnp.float32, scan_impl="chunked",
    )
    assert tokens.shape == (1, model.cfg.num_tokens)


def test_build_model_mamba_pretrain_nonstrict(tmp_path):
    """mamba_pretrain load path: pure-LM checkpoint without LoRA keys
    (omnimamba.py:99-101 non-strict semantics)."""
    base = MODEL_REGISTRY["OmniMamba-Tiny"]().resized(GPT_NEOX_BASE_VOCAB + 10)
    rng = np.random.default_rng(1)
    sd = reference_style_state_dict(base, rng)
    sd = {k: v for k, v in sd.items() if "lora" not in k}
    path = str(tmp_path / "mamba_lm.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)

    cfg = TrainConfig(
        omnimamba_model="OmniMamba-Tiny",
        image_backbone="dinosiglip-tiny",
        mamba_pretrain=path,
        mmu_task=False,
    )
    model, params, uni = build_model(cfg, stage="align", with_vq=False)
    # LoRA B stays zero (fresh init), base weights loaded
    assert float(np.abs(params["mamba"]["layers"]["mixer"]["lora"]["t2i_B_z"]).max()) == 0
    np.testing.assert_allclose(
        np.asarray(params["mamba"]["norm_f"]["weight"]),
        sd["backbone.norm_f.weight"],
        rtol=1e-6,
    )
