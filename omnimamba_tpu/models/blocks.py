"""Pre-norm residual block around the Mamba-2 mixer.

Reference: ``models/stage2/block.py:18-150`` — the order is
Add -> Norm -> Mixer, returning (mixer_out, new_residual) with the residual
kept in fp32 (``residual_in_fp32=True``, config_mamba.py:20). The shipped
configs use no MLP (``d_intermediate=0`` => mlp=None) and no adaLN
(``adaln=False`` at mixer_seq_simple.py:333); the dead adaLN path is not
reproduced (SURVEY §2.2).

These functions operate on ONE layer's params; the backbone stacks all 48
layers on a leading axis and drives them with ``lax.scan`` (compile-time
friendly; the XLA analog of the reference's Python layer loop).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax

from omnimamba_tpu.config import LoraConfig, Mamba2LayerConfig
from omnimamba_tpu.models.mamba2 import (
    Mamba2Cache,
    mamba2_forward,
    mamba2_step,
)
from omnimamba_tpu.ops.norms import add_norm


def block_forward(
    layer_params: Dict,
    hidden: jax.Array,  # (B, L, d) activation dtype
    residual: Optional[jax.Array],  # (B, L, d) fp32 or None
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig],
    *,
    norm_eps: float = 1e-5,
    scan_impl: str = "chunked",
    return_cache: bool = False,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[Mamba2Cache]]:
    """One block, full-sequence (reference block.py:71-117 fused path)."""
    normed, new_residual = add_norm(
        hidden,
        residual,
        layer_params["norm"]["weight"],
        eps=norm_eps,
        is_rms=True,
        residual_in_fp32=True,
        prenorm=True,
    )
    out, cache = mamba2_forward(
        layer_params["mixer"],
        normed,
        task,
        cfg,
        lora_cfg,
        scan_impl=scan_impl,
        return_cache=return_cache,
        dropout_key=dropout_key,
    )
    return out, new_residual, cache


def block_step(
    layer_params: Dict,
    hidden: jax.Array,  # (B, d)
    residual: Optional[jax.Array],
    cache: Mamba2Cache,
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig],
    *,
    norm_eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array, Mamba2Cache]:
    """One block, one decode token."""
    normed, new_residual = add_norm(
        hidden,
        residual,
        layer_params["norm"]["weight"],
        eps=norm_eps,
        is_rms=True,
        residual_in_fp32=True,
        prenorm=True,
    )
    out, new_cache = mamba2_step(
        layer_params["mixer"], normed, cache, task, cfg, lora_cfg
    )
    return out, new_residual, new_cache
