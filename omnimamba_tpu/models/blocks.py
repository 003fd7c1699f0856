"""Pre-norm residual block around a mixer (Mamba-2 or MHA) + optional MLP.

Reference: ``models/stage2/block.py:18-150`` — the order is
Add -> Norm -> Mixer, returning (mixer_out, new_residual) with the residual
kept in fp32 (``residual_in_fp32=True``, config_mamba.py:20). When
``d_intermediate > 0`` a second Add -> Norm -> GatedMLP follows
(block.py:120-144); when a layer index is in ``attn_layer_idx`` the mixer is
MHA instead of Mamba-2 (mixer_seq_simple.py:194-207). Both options are
dormant in every shipped config but part of the config surface. The dead
adaLN path (``adaln=False`` always, mixer_seq_simple.py:333) is not
reproduced (SURVEY §2.2).

These functions operate on ONE layer's params; the backbone stacks
homogeneous layers on a leading axis and drives them with ``lax.scan``, or
Python-loops a heterogeneous list when attention layers are present.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax

from omnimamba_tpu.config import LoraConfig, Mamba2LayerConfig
from omnimamba_tpu.models.mamba2 import (
    Mamba2Cache,
    mamba2_forward,
    mamba2_step,
)
from omnimamba_tpu.ops.attention import MHACache, gated_mlp, mha_forward, mha_step
from omnimamba_tpu.ops.norms import add_norm

BlockCache = Union[Mamba2Cache, MHACache]


def _maybe_mlp_forward(layer_params, hidden, residual, norm_eps):
    """Second Add->Norm->GatedMLP sub-block (block.py:120-144)."""
    if "mlp" not in layer_params:
        return hidden, residual
    normed, new_residual = add_norm(
        hidden, residual, layer_params["norm2"]["weight"],
        eps=norm_eps, is_rms=True, residual_in_fp32=True, prenorm=True,
    )
    return gated_mlp(layer_params["mlp"], normed), new_residual


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
    layer_type: str = "mamba2",
    attn_num_heads: int = 16,
    attn_rotary_dim: int = 0,
    attn_max_len: Optional[int] = None,
    initial_cache: Optional[BlockCache] = None,
    valid_len=None,
) -> Tuple[jax.Array, jax.Array, Optional[BlockCache]]:
    """One block, full-sequence (reference block.py:71-117 fused path).

    ``initial_cache``/``valid_len``: continuation prefill from an existing
    decode state (mamba2.mamba2_forward docstring; mamba2 layers only)."""
    normed, new_residual = add_norm(
        hidden,
        residual,
        layer_params["norm"]["weight"],
        eps=norm_eps,
        is_rms=True,
        residual_in_fp32=True,
        prenorm=True,
    )
    if layer_type == "mamba2":
        out, cache = mamba2_forward(
            layer_params["mixer"],
            normed,
            task,
            cfg,
            lora_cfg,
            scan_impl=scan_impl,
            return_cache=return_cache,
            dropout_key=dropout_key,
            initial_cache=initial_cache,
            valid_len=valid_len,
        )
    elif layer_type == "mha":
        out, cache = mha_forward(
            layer_params["mixer"],
            normed,
            attn_num_heads,
            rotary_dim=attn_rotary_dim,
            return_cache=return_cache,
            max_len=attn_max_len,
        )
    else:
        raise ValueError(layer_type)
    out, new_residual = _maybe_mlp_forward(layer_params, out, new_residual, norm_eps)
    return out, new_residual, cache


def block_step(
    layer_params: Dict,
    hidden: jax.Array,  # (B, d)
    residual: Optional[jax.Array],
    cache: BlockCache,
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig],
    *,
    norm_eps: float = 1e-5,
    layer_type: str = "mamba2",
    attn_num_heads: int = 16,
    attn_rotary_dim: int = 0,
) -> Tuple[jax.Array, jax.Array, BlockCache]:
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
    if layer_type == "mamba2":
        out, new_cache = mamba2_step(
            layer_params["mixer"], normed, cache, task, cfg, lora_cfg
        )
    elif layer_type == "mha":
        out, new_cache = mha_step(
            layer_params["mixer"], normed, cache, attn_num_heads,
            rotary_dim=attn_rotary_dim,
        )
    else:
        raise ValueError(layer_type)
    out, new_residual = _maybe_mlp_forward(layer_params, out, new_residual, norm_eps)
    return out, new_residual, new_cache
