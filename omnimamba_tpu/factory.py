"""Model factory — builds the full OmniMamba bundle from a TrainConfig.

The TPU analog of ``OmniMamba(args, stage)`` construction
(reference ``models/omnimamba.py:49-103`` + ``models/mamba_vlm.py:15-43``):
tokenizer + UniversalPrompting (vocab grows 50277 -> 50287 -> padded 50288),
model config from the registry, random init, then optional checkpoint loads
(vq_ckpt / omnimamba_ckpt / mamba_pretrain) via the torch converters.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import (
    MODEL_REGISTRY,
    VISION_BACKBONES,
    MambaConfig,
    TrainConfig,
    VisionConfig,
    VQConfig,
)
from omnimamba_tpu.data.prompting import UniversalPrompting
from omnimamba_tpu.data.tokenizer import load_text_tokenizer
from omnimamba_tpu.models.omnimamba import OmniMambaModel, init_omnimamba


def build_model(
    train_cfg: TrainConfig,
    *,
    stage: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.float32,
    with_vision: Optional[bool] = None,
    with_vq: Optional[bool] = None,
) -> Tuple[OmniMambaModel, Dict, UniversalPrompting]:
    """Returns (model, params, uni_prompting)."""
    stage = stage or train_cfg.stage
    tokenizer = load_text_tokenizer()
    uni = UniversalPrompting(tokenizer)

    cfg: MambaConfig = MODEL_REGISTRY[train_cfg.omnimamba_model]()
    cfg = dataclasses.replace(
        cfg, t2i_task=train_cfg.t2i_task, mmu_task=train_cfg.mmu_task
    )
    cfg = cfg.resized(len(tokenizer))  # 50287 -> 50288 (omnimamba.py:102-103)

    vision_cfg = VISION_BACKBONES.get(train_cfg.image_backbone, VisionConfig)()
    model = OmniMambaModel(
        cfg=cfg,
        vision_cfg=vision_cfg,
        vq_cfg=VQConfig(),
        sptids=uni.sptids_dict,
    )
    if with_vision is None:
        with_vision = train_cfg.mmu_task
    if with_vq is None:
        with_vq = train_cfg.t2i_task

    params = init_omnimamba(
        jax.random.PRNGKey(seed), model, dtype,
        with_vision=with_vision, with_vq=with_vq,
    )
    params = load_pretrained_into(params, model, train_cfg)
    return model, params, uni


def load_pretrained_into(params: Dict, model: OmniMambaModel, train_cfg: TrainConfig) -> Dict:
    """Checkpoint loading order mirrors load_pretrain_model
    (omnimamba.py:88-103): vq_ckpt, then omnimamba_ckpt (full), else
    mamba_pretrain (non-strict LM weights)."""
    from omnimamba_tpu.utils import convert

    def as_dtype(tree, like):
        return jax.tree.map(
            lambda a, b: jnp.asarray(a, dtype=b.dtype), tree, like,
        )

    if train_cfg.vq_ckpt and "vq" in params:
        sd = convert.load_torch_state_dict(train_cfg.vq_ckpt)
        params["vq"] = as_dtype(convert.convert_vq(sd, model.vq_cfg), params["vq"])
    if train_cfg.omnimamba_ckpt:
        path = train_cfg.omnimamba_ckpt
        if path.endswith(".npz"):
            from omnimamba_tpu.utils.checkpoint import load_params_npz

            loaded = load_params_npz(path, params)
            params = jax.tree.map(jnp.asarray, loaded)
        else:
            sd = convert.load_torch_state_dict(path)
            converted = convert.convert_omnimamba_checkpoint(sd, model.cfg)
            for k, v in converted.items():
                if k not in params:
                    # e.g. projector weights in the ckpt but mmu_task off —
                    # mirrors the reference's non-strict load tolerance
                    continue
                params[k] = as_dtype(v, params[k])
    elif train_cfg.mamba_pretrain:
        sd = convert.load_torch_state_dict(train_cfg.mamba_pretrain)
        converted = convert.convert_mamba_lm(sd, model.cfg)
        params["mamba"] = as_dtype(converted, params["mamba"])
    return params
