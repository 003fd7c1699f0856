"""Merge task LoRA into the base in_proj weights for inference.

The reference's LoRA layers carry ``merge_weights`` machinery that folds
``scale * A @ B`` into the frozen weight at eval time so the forward pays
zero extra matmuls (``models/stage2/lora.py:166-246``). Here the analog is a
pure params-tree transform: for a FIXED task, add each layer's
``scaling * A_i @ B_part_i`` into the matching in_proj column slice and drop
the ``lora`` subtree. ``_project_parts`` (models/mamba2.py) then skips LoRA
entirely, which also re-enables the one-dispatch ``fuse_in_proj`` decode
fast path (ops/quant.py) — per decode step that removes 1 + 4*parts tiny
matmuls per layer.

Correctness: inference applies no LoRA dropout, so the merged forward
computes the same mathematical function for that task. Numerics caveat at
bf16: the fold rounds ``W + scale*A@B`` ONCE into the bf16 weight, while
the unmerged path rounds the LoRA contribution at the activation level —
outputs can differ at rounding scale, which per the repo's fidelity notes
can flip a greedy argmax at rounding-scale margins. fp32 weights merge
exactly (tests). The result is TASK-SPECIFIC — serving both tasks needs
one merged tree per task (in_proj is ~13% of 1.3B weights) or the
unmerged original.

Merge BEFORE ``quantize_decode_params``: folding into int8 blocks would
re-quantize noise.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import LoraConfig

_PARTS = ("z", "x", "bc", "dt")


def _merge_mixer(mixer: Dict, task: str, lora_cfg: LoraConfig) -> Dict:
    lp = mixer.get("lora")
    if lp is None or f"{task}_A" not in lp:
        return mixer
    ip = dict(mixer["in_proj"])
    if "fused" in ip or any(not hasattr(ip[p], "dtype") for p in _PARTS):
        raise ValueError(
            "merge_lora needs plain unfused in_proj kernels — merge before "
            "fuse_in_proj/quantize_decode_params"
        )
    A = lp[f"{task}_A"]  # (..., lora_nums, d_model, r)
    scale = lora_cfg.scaling
    for part in _PARTS:
        B = lp[f"{task}_B_{part}"]  # (..., lora_nums, r, dim)
        # contract r, sum lora_nums; fp32 accumulation, cast back
        delta = jnp.einsum(
            "...idr,...irp->...dp",
            A.astype(jnp.float32),
            B.astype(jnp.float32),
        )
        ip[part] = (ip[part].astype(jnp.float32) + scale * delta).astype(
            ip[part].dtype
        )
    out = dict(mixer)
    out["in_proj"] = ip
    out.pop("lora")
    return out


def merge_lora(params: Dict, task: str, lora_cfg: LoraConfig) -> Dict:
    """Return a params tree with ``task``'s LoRA folded into in_proj.

    Accepts a full model tree ({"mamba": ...}), a backbone tree (has
    "layers"), stacked-layer dicts, and heterogeneous layer lists. Layers
    without LoRA pass through unchanged.
    """
    if "mamba" in params:
        out = dict(params)
        out["mamba"] = merge_lora(params["mamba"], task, lora_cfg)
        return out
    out = dict(params)
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        merged = []
        for layer in layers:
            nl = dict(layer)
            if "mixer" in nl and "lora" in nl["mixer"]:
                nl["mixer"] = _merge_mixer(nl["mixer"], task, lora_cfg)
            merged.append(nl)
        out["layers"] = type(layers)(merged)
    else:
        nl = dict(layers)
        if "mixer" in nl and "lora" in nl["mixer"]:
            nl["mixer"] = _merge_mixer(nl["mixer"], task, lora_cfg)
        out["layers"] = nl
    return out
