"""Reference (PyTorch) checkpoint -> TPU params pytree converters.

Maps the exact state-dict layouts of the reference:

- MambaLMHeadModel (``models/stage2/mixer_seq_simple.py`` state dict):
  ``backbone.embedding.weight``, ``backbone.layers.{i}.mixer.*`` with
  LoRA-wrapped ``in_proj`` (``lora.py:185-228`` names ``in_proj.weight``,
  ``in_proj.{t2i,mmu}_lora_{A,B}0.weight``), fused in_proj rows ordered
  [z | x | B | C | dt] (mamba_ssm Mamba2 layout), conv1d (channels, 1, W),
  tied heads.
- VQModel (``llamagen_tokenizer/tokenizer_image/vq_model.py``): NCHW convs,
  ``quantize.embedding.weight`` (the ``codebook_used`` buffer is dropped, as
  in reference ``omnimamba.py:91-92``).
- timm ViTs (DINOv2/SigLIP) for the vision backbone.

All outputs are numpy (host) pytrees matching the shapes produced by the
corresponding ``init_*`` functions; dtypes preserved unless ``dtype`` given.
Torch is only imported for ``.pt`` loading — tensors go straight to numpy.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from omnimamba_tpu.config import MambaConfig, Mamba2LayerConfig, ViTConfig, VQConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().float().numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and all(
        hasattr(v, "shape") for v in sd["model"].values()
    ):
        sd = sd["model"]  # llamagen vq checkpoint nesting (mamba_vlm.py:65-66)
    return {k: _np(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Mamba backbone
# ---------------------------------------------------------------------------


def _split_in_proj_rows(w: np.ndarray, cfg: Mamba2LayerConfig) -> Dict[str, np.ndarray]:
    """Fused (d_in_proj, *) rows [z | x | B | C | dt] -> part dict."""
    d_inner, gn, H = cfg.d_inner, cfg.ngroups * cfg.d_state, cfg.nheads
    o = 0
    out = {}
    out["z"] = w[o : o + d_inner]
    o += d_inner
    out["x"] = w[o : o + d_inner]
    o += d_inner
    out["bc"] = w[o : o + 2 * gn]
    o += 2 * gn
    out["dt"] = w[o : o + H]
    assert o + H == w.shape[0], (o + H, w.shape)
    return out


def convert_mamba_layer(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: MambaConfig
) -> Dict:
    """One ``backbone.layers.{i}`` -> our per-layer dict."""
    m = cfg.mixer
    d_inner = m.d_inner
    w = sd[f"{prefix}.mixer.in_proj.weight"]  # (d_in_proj, d_model)
    parts = _split_in_proj_rows(w, m)
    in_proj = {k: np.ascontiguousarray(v.T) for k, v in parts.items()}

    conv_w = sd[f"{prefix}.mixer.conv1d.weight"][:, 0, :].T  # (ch,1,W)->(W,ch)
    conv_b = sd[f"{prefix}.mixer.conv1d.bias"]
    conv = {
        "weight_x": conv_w[:, :d_inner],
        "bias_x": conv_b[:d_inner],
        "weight_bc": conv_w[:, d_inner:],
        "bias_bc": conv_b[d_inner:],
    }

    lora = {}
    r = cfg.lora.r
    for task in ("t2i", "mmu"):
        a_key = f"{prefix}.mixer.in_proj.{task}_lora_A0.weight"
        if a_key in sd:
            A = sd[a_key]  # (r, d)
            B = sd[f"{prefix}.mixer.in_proj.{task}_lora_B0.weight"]  # (d_in_proj, r)
        else:
            # non-strict pretrain load (omnimamba.py:99-101): LoRA keeps its
            # fresh init — kaiming-uniform A, zero B
            rng = np.random.default_rng(hash((prefix, task)) % (2**31))
            bound = 1.0 / np.sqrt(cfg.d_model)
            A = rng.uniform(-bound, bound, (r, cfg.d_model)).astype(np.float32)
            B = np.zeros((w.shape[0], r), np.float32)
        lora[f"{task}_A"] = A.T[None]  # (1, d, r)
        bparts = _split_in_proj_rows(B, m)
        for part, rows in bparts.items():
            lora[f"{task}_B_{part}"] = np.ascontiguousarray(rows.T)[None]  # (1, r, dim)

    return {
        "norm": {"weight": sd[f"{prefix}.norm.weight"]},
        "mixer": {
            "in_proj": in_proj,
            "conv": conv,
            "dt_bias": sd[f"{prefix}.mixer.dt_bias"],
            "A_log": sd[f"{prefix}.mixer.A_log"],
            "D": sd[f"{prefix}.mixer.D"],
            "norm": {"weight": sd[f"{prefix}.mixer.norm.weight"]},
            "out_proj": {
                "kernel": np.ascontiguousarray(sd[f"{prefix}.mixer.out_proj.weight"].T)
            },
            "lora": lora,
        },
    }


def convert_mamba_lm(
    sd: Mapping[str, np.ndarray], cfg: MambaConfig, strict_vocab: bool = False
) -> Dict:
    """Full MambaLMHeadModel state dict -> backbone params pytree
    (init_backbone structure; heads are weight-tied so only tables load)."""
    import jax

    params: Dict = {}
    emb = sd["backbone.embedding.weight"]
    if not strict_vocab and emb.shape[0] < cfg.padded_vocab_size:
        # resize_token_embeddings semantics: copy rows, new rows ~N(0,.02)
        pad = np.random.default_rng(0).normal(
            0, 0.02, (cfg.padded_vocab_size - emb.shape[0], emb.shape[1])
        ).astype(emb.dtype)
        emb = np.concatenate([emb, pad], 0)
    params["embedding"] = emb

    if cfg.t2i_task and "backbone.img_embeddings.word_embeddings.weight" in sd:
        pi = "backbone.img_embeddings.project_in.projector"
        params["img_embeddings"] = {
            "word_embeddings": sd["backbone.img_embeddings.word_embeddings.weight"],
            "project_in": {
                "fc1": {"kernel": sd[f"{pi}.0.weight"].T, "bias": sd[f"{pi}.0.bias"]},
                "fc2": {"kernel": sd[f"{pi}.2.weight"].T, "bias": sd[f"{pi}.2.bias"]},
                "fc3": {"kernel": sd[f"{pi}.4.weight"].T, "bias": sd[f"{pi}.4.bias"]},
            },
        }
        params["pos_embed"] = sd["backbone.pos_embed"]
        params["caption_embed"] = {
            "fc1": {"kernel": sd["backbone.caption_embed.cap_proj.fc1.weight"].T, "bias": None},
            "fc2": {"kernel": sd["backbone.caption_embed.cap_proj.fc2.weight"].T, "bias": None},
        }
    if cfg.mmu_task and "backbone.mmu_pos_embed" in sd:
        params["mmu_pos_embed"] = sd["backbone.mmu_pos_embed"]

    layers = [
        convert_mamba_layer(sd, f"backbone.layers.{i}", cfg)
        for i in range(cfg.n_layer)
    ]
    params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params["norm_f"] = {"weight": sd["backbone.norm_f.weight"]}
    return params


# ---------------------------------------------------------------------------
# VQ model
# ---------------------------------------------------------------------------


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _conv(sd, name) -> Dict:
    return {"kernel": _conv_hwio(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}


def _gn(sd, name) -> Dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _res_block(sd, p) -> Dict:
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _attn_block(sd, p) -> Dict:
    return {
        "norm": _gn(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_vq(sd: Mapping[str, np.ndarray], cfg: VQConfig) -> Dict:
    """VQModel state dict -> init_vq structure (vq_model.py layout)."""
    sd = {k: v for k, v in sd.items() if "codebook_used" not in k}
    n_lv_e = len(cfg.encoder_ch_mult)
    enc_levels = []
    for i in range(n_lv_e):
        lvl = {
            "res": [
                _res_block(sd, f"encoder.conv_blocks.{i}.res.{j}")
                for j in range(cfg.num_res_blocks)
            ],
            "attn": [],
        }
        for j in range(cfg.num_res_blocks):
            if f"encoder.conv_blocks.{i}.attn.{j}.q.weight" in sd:
                lvl["attn"].append(_attn_block(sd, f"encoder.conv_blocks.{i}.attn.{j}"))
        if f"encoder.conv_blocks.{i}.downsample.conv.weight" in sd:
            lvl["downsample"] = _conv(sd, f"encoder.conv_blocks.{i}.downsample.conv")
        enc_levels.append(lvl)
    encoder = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "levels": enc_levels,
        "mid": {
            "res1": _res_block(sd, "encoder.mid.0"),
            "attn": _attn_block(sd, "encoder.mid.1"),
            "res2": _res_block(sd, "encoder.mid.2"),
        },
        "norm_out": _gn(sd, "encoder.norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    n_lv_d = len(cfg.decoder_ch_mult)
    dec_levels = []
    for s in range(n_lv_d):  # decoder stages in forward order
        lvl = {
            "res": [
                _res_block(sd, f"decoder.conv_blocks.{s}.res.{j}")
                for j in range(cfg.num_res_blocks + 1)
            ],
            "attn": [],
        }
        for j in range(cfg.num_res_blocks + 1):
            if f"decoder.conv_blocks.{s}.attn.{j}.q.weight" in sd:
                lvl["attn"].append(_attn_block(sd, f"decoder.conv_blocks.{s}.attn.{j}"))
        if f"decoder.conv_blocks.{s}.upsample.conv.weight" in sd:
            lvl["upsample"] = _conv(sd, f"decoder.conv_blocks.{s}.upsample.conv")
        dec_levels.append(lvl)
    decoder = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "res1": _res_block(sd, "decoder.mid.0"),
            "attn": _attn_block(sd, "decoder.mid.1"),
            "res2": _res_block(sd, "decoder.mid.2"),
        },
        "levels": dec_levels,
        "norm_out": _gn(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "codebook": sd["quantize.embedding.weight"],
    }


# ---------------------------------------------------------------------------
# timm ViT
# ---------------------------------------------------------------------------


def resample_abs_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """timm ``resample_abs_pos_embed`` semantics: (1, g*g, d) patch-position
    table -> (1, new_grid**2, d) via fp32 bicubic interpolation with
    antialias, exactly as timm does when a model is created with an
    ``img_size`` override (timm/layers/pos_embed.py — F.interpolate(
    mode='bicubic', antialias=True)).

    torch is used when importable (bit-identical to timm's own load path —
    this code runs host-side on torch checkpoints anyway); the jax.image
    fallback agrees to ~1e-3 on unit-scale tables (pinned in
    tests/test_transforms.py::test_pos_embed_resample_matches_torch).
    """
    _, n, d = pos.shape
    g = int(np.sqrt(n))
    assert g * g == n, f"pos table is not square: {n}"
    if g == new_grid:
        return pos
    grid = pos.reshape(1, g, g, d).astype(np.float32)
    try:
        import torch
        import torch.nn.functional as F

        out = F.interpolate(
            torch.from_numpy(grid).permute(0, 3, 1, 2),
            size=(new_grid, new_grid), mode="bicubic", antialias=True,
        )
        out = out.permute(0, 2, 3, 1).numpy()
    except ImportError:  # zero-torch environments: jax.image cubic
        import jax
        import jax.numpy as jnp

        out = np.asarray(
            jax.image.resize(
                jnp.asarray(grid), (1, new_grid, new_grid, d), "cubic",
                antialias=True,
            )
        )
    return out.reshape(1, new_grid * new_grid, d).astype(pos.dtype)


def convert_timm_vit(sd: Mapping[str, np.ndarray], cfg: ViTConfig) -> Dict:
    """timm VisionTransformer state dict -> init_vit structure.

    Handles DINOv2 (cls + reg tokens, LayerScale) and SigLIP (no prefix)
    checkpoints; pos_embed is taken for patch tokens only (no_embed_class
    layout for reg models, cls+patches otherwise -> cls row dropped)."""
    p: Dict = {
        "patch_embed": {
            "kernel": _conv_hwio(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        }
    }
    pos = sd["pos_embed"]
    n_prefix = 0
    if pos.shape[1] != cfg.num_patches and int(np.sqrt(pos.shape[1])) ** 2 != pos.shape[1]:
        n_prefix = 1  # embed_class layout: cls position leads (timm vit)
    elif pos.shape[1] == cfg.num_patches + 1:
        n_prefix = 1
    if n_prefix:
        pos = pos[:, n_prefix:]  # drop cls position (embed_class layout)
    if pos.shape[1] != cfg.num_patches:
        # checkpoint grid != runtime grid (e.g. DINOv2 pretrained at 518px =
        # 37x37 patches, run at 384px = 27x27): timm resamples the table at
        # load via resample_abs_pos_embed — F.interpolate(mode='bicubic',
        # antialias=True) in fp32 (timm/layers/pos_embed.py). Reproduced
        # here; pinned against torch in tests/test_transforms.py.
        pos = resample_abs_pos_embed(pos, cfg.grid)
    p["pos_embed"] = pos
    if cfg.use_cls_token:
        p["cls_token"] = sd["cls_token"]
    if cfg.num_reg_tokens:
        p["reg_tokens"] = sd["reg_token"]
    blocks = []
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
            "attn": {
                "qkv": {
                    "kernel": sd[f"{b}.attn.qkv.weight"].T,
                    "bias": sd[f"{b}.attn.qkv.bias"],
                },
                "proj": {
                    "kernel": sd[f"{b}.attn.proj.weight"].T,
                    "bias": sd[f"{b}.attn.proj.bias"],
                },
            },
            "norm2": {"scale": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
            "mlp": {
                "fc1": {
                    "kernel": sd[f"{b}.mlp.fc1.weight"].T,
                    "bias": sd[f"{b}.mlp.fc1.bias"],
                },
                "fc2": {
                    "kernel": sd[f"{b}.mlp.fc2.weight"].T,
                    "bias": sd[f"{b}.mlp.fc2.bias"],
                },
            },
        }
        if cfg.layerscale:
            blk["ls1"] = {"gamma": sd[f"{b}.ls1.gamma"]}
            blk["ls2"] = {"gamma": sd[f"{b}.ls2.gamma"]}
        blocks.append(blk)
    import jax

    p["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
    p["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return p


# ---------------------------------------------------------------------------
# full OmniMamba checkpoint (omnimamba_ckpt .pth, omnimamba.py:94-97)
# ---------------------------------------------------------------------------


def convert_omnimamba_checkpoint(
    sd: Mapping[str, np.ndarray], cfg: MambaConfig
) -> Dict:
    """Flat OmniMamba state dict -> {"mamba": ..., "projector": ...}.

    Vision backbone weights (timm ViTs) and VQ live under their own prefixes
    and are converted when present.
    """
    out: Dict = {}
    mamba_sd = {
        k.removeprefix("llm_backbone.mamba."): v
        for k, v in sd.items()
        if k.startswith("llm_backbone.mamba.")
    }
    if mamba_sd:
        out["mamba"] = convert_mamba_lm(mamba_sd, cfg)
    proj_sd = {k: v for k, v in sd.items() if k.startswith("projector.projector.")}
    if proj_sd:
        out["projector"] = {
            "fc1": {
                "kernel": sd["projector.projector.0.weight"].T,
                "bias": sd["projector.projector.0.bias"],
            },
            "fc2": {
                "kernel": sd["projector.projector.2.weight"].T,
                "bias": sd["projector.projector.2.bias"],
            },
            "fc3": {
                "kernel": sd["projector.projector.4.weight"].T,
                "bias": sd["projector.projector.4.bias"],
            },
        }
    return out
