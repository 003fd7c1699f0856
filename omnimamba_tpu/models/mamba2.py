"""Mamba-2 mixer — TPU-native replacement for ``mamba_ssm.modules.mamba2.Mamba2``.

The reference instantiates this (externally, mamba_ssm==2.2.2) per block via
``ssm_cfg={'layer': 'Mamba2'}`` (``models/stage2/config_mamba.py:16``,
``mixer_seq_simple.py:196-205``). Pipeline:

    in_proj (LoRA'd, reference lora.py:185)      -> [z | xBC | dt]
    depthwise causal conv + SiLU on xBC          -> [x | B | C]
    chunked SSD scan (h_t = e^{dt A} h + dt B x) -> y
    gated RMSNorm(y, z), out_proj                -> (B, L, d_model)

Train/prefill use the chunked SSD (``ops/ssd_chunked.py`` in XLA, or the
Pallas kernel in ``ops/ssd_pallas.py``); decode is the O(1) recurrent
``mamba2_step`` carrying (conv_state, ssm_state) — the TPU analog of
``causal_conv1d_update`` + ``selective_state_update``.

Parameter layout is TPU-first: matmul kernels stored (in, out), conv taps
(W, C) with channels on the lane axis.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import LoraConfig, Mamba2LayerConfig
from omnimamba_tpu.models.lora import init_lora, lora_delta
from omnimamba_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_step,
    conv_state_from_sequence,
)
from omnimamba_tpu.ops.norms import gated_rms_norm
from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.ops.ssd_reference import ssd_scan_reference, ssd_step


class Mamba2Cache(NamedTuple):
    """Per-layer recurrent decode state (constant memory, no KV cache).

    Mirrors the (conv_state, ssm_state) pair the reference allocates via
    ``allocate_inference_cache`` (mixer_seq_simple.py:359-363).
    """

    conv_state: jax.Array  # (B, W-1, d_conv_in) activation dtype
    ssm_state: jax.Array  # (B, H, P, N) fp32


def init_mamba2(
    key: jax.Array,
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig],
    n_layer: int,
    dtype=jnp.float32,
) -> Dict:
    """Initialize one mixer's params matching the reference distributions:
    torch-Linear kaiming-uniform for projections, GPT-2 1/sqrt(n_layer)
    residual rescale on out_proj (mixer_seq_simple.py:233-262), Mamba-2's
    A/dt/D init (mamba_ssm defaults)."""
    k = jax.random.split(key, 8)
    d_model, d_inner = cfg.d_model, cfg.d_inner
    H, W = cfg.nheads, cfg.d_conv

    bound_in = 1.0 / math.sqrt(d_model)
    in_proj = jax.random.uniform(
        k[0], (d_model, cfg.d_in_proj), dtype, minval=-bound_in, maxval=bound_in
    )
    bound_out = 1.0 / math.sqrt(d_inner)
    out_proj = jax.random.uniform(
        k[1], (d_inner, d_model), dtype, minval=-bound_out, maxval=bound_out
    ) / math.sqrt(n_layer)

    # depthwise conv: torch Conv1d default with fan_in = kernel_size
    bound_c = 1.0 / math.sqrt(W)
    conv_w = jax.random.uniform(
        k[2], (W, cfg.d_conv_in), dtype, minval=-bound_c, maxval=bound_c
    )
    conv_b = jax.random.uniform(
        k[3], (cfg.d_conv_in,), dtype, minval=-bound_c, maxval=bound_c
    )

    # dt_bias = softplus^-1(dt), dt ~ exp(U(log dt_min, log dt_max))
    u = jax.random.uniform(k[4], (H,), jnp.float32)
    dt = jnp.exp(u * (math.log(cfg.dt_max) - math.log(cfg.dt_min)) + math.log(cfg.dt_min))
    dt = jnp.maximum(dt, cfg.dt_init_floor)
    dt_bias = dt + jnp.log(-jnp.expm1(-dt))

    # A ~ U(1, 16), stored as log
    A_log = jnp.log(
        jax.random.uniform(
            k[5], (H,), jnp.float32, minval=cfg.a_init_min, maxval=cfg.a_init_max
        )
    )

    params = {
        "in_proj": {"kernel": in_proj},
        "conv": {"weight": conv_w, "bias": conv_b},
        "dt_bias": dt_bias.astype(dtype),
        "A_log": A_log.astype(dtype),
        "D": jnp.ones((H,), dtype),
        "norm": {"weight": jnp.ones((d_inner,), dtype)},
        "out_proj": {"kernel": out_proj},
    }
    if lora_cfg is not None:
        params["lora"] = init_lora(k[6], lora_cfg, d_model, cfg.d_in_proj, dtype)
    return params


def _project_and_split(
    params: Dict,
    x: jax.Array,  # (B, L, d_model) or (B, d_model)
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig],
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """in_proj (+task LoRA) then split into (z, xBC, dt_raw)."""
    kernel = params["in_proj"]["kernel"].astype(x.dtype)
    zxbcdt = x @ kernel
    if task is not None and "lora" in params and lora_cfg is not None:
        zxbcdt = zxbcdt + lora_delta(
            params["lora"], x, task, lora_cfg, dropout_key=dropout_key
        )
    d_inner = cfg.d_inner
    d_xbc = cfg.d_conv_in
    z = zxbcdt[..., :d_inner]
    xBC = zxbcdt[..., d_inner : d_inner + d_xbc]
    dt_raw = zxbcdt[..., d_inner + d_xbc :]
    return z, xBC, dt_raw


def _split_xbc(xBC: jax.Array, cfg: Mamba2LayerConfig):
    d_inner, G, N = cfg.d_inner, cfg.ngroups, cfg.d_state
    xs = xBC[..., :d_inner]
    Bm = xBC[..., d_inner : d_inner + G * N]
    Cm = xBC[..., d_inner + G * N :]
    return xs, Bm, Cm


def _dt_activation(dt_raw: jax.Array, dt_bias: jax.Array, cfg: Mamba2LayerConfig):
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    lo, hi = cfg.dt_limit
    if lo > 0.0 or hi < float("inf"):
        dt = jnp.clip(dt, lo, hi)
    return dt


def mamba2_forward(
    params: Dict,
    x: jax.Array,  # (B, L, d_model)
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig] = None,
    *,
    scan_impl: str = "chunked",  # chunked | reference | pallas
    return_cache: bool = False,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Mamba2Cache]]:
    """Full-sequence forward (train / prefill).

    With ``return_cache=True`` also returns the final (conv, ssm) state so a
    decode loop can continue — the prefill path of generation
    (reference generation.py:241: prefill then 1-token steps).
    """
    B, L, _ = x.shape
    H, P, G, N = cfg.nheads, cfg.headdim, cfg.ngroups, cfg.d_state

    z, xBC_raw, dt_raw = _project_and_split(
        params, x, task, cfg, lora_cfg, dropout_key
    )
    xBC = causal_conv1d(
        xBC_raw, params["conv"]["weight"], params["conv"]["bias"], activation="silu"
    )
    xs, Bm, Cm = _split_xbc(xBC, cfg)
    dt = _dt_activation(dt_raw, params["dt_bias"], cfg)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    xh = xs.reshape(B, L, H, P)
    Bh = Bm.reshape(B, L, G, N)
    Ch = Cm.reshape(B, L, G, N)

    if scan_impl == "chunked":
        y, final_state = ssd_chunked(
            xh, dt, A, Bh, Ch, params["D"], chunk_size=cfg.chunk_size
        )
    elif scan_impl == "reference":
        y, final_state = ssd_scan_reference(xh, dt, A, Bh, Ch, params["D"])
    elif scan_impl == "pallas":
        from omnimamba_tpu.ops.ssd_pallas import ssd_pallas

        y, final_state = ssd_pallas(
            xh, dt, A, Bh, Ch, params["D"], chunk_size=cfg.chunk_size
        )
    else:
        raise ValueError(f"unknown scan_impl {scan_impl}")

    y = y.reshape(B, L, cfg.d_inner)
    y = gated_rms_norm(y, z, params["norm"]["weight"], cfg.norm_eps)
    out = y @ params["out_proj"]["kernel"].astype(y.dtype)

    cache = None
    if return_cache:
        conv_state = conv_state_from_sequence(xBC_raw, cfg.d_conv)
        cache = Mamba2Cache(conv_state=conv_state, ssm_state=final_state)
    return out, cache


def init_cache(
    batch: int, cfg: Mamba2LayerConfig, dtype=jnp.bfloat16
) -> Mamba2Cache:
    """Empty decode state (analog of allocate_inference_cache,
    reference mixer_seq_simple.py:359-363)."""
    return Mamba2Cache(
        conv_state=jnp.zeros((batch, cfg.d_conv - 1, cfg.d_conv_in), dtype),
        ssm_state=jnp.zeros(
            (batch, cfg.nheads, cfg.headdim, cfg.d_state), jnp.float32
        ),
    )


def mamba2_step(
    params: Dict,
    x_t: jax.Array,  # (B, d_model)
    cache: Mamba2Cache,
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig] = None,
) -> Tuple[jax.Array, Mamba2Cache]:
    """O(1) single-token decode step (reference Mamba2.step semantics)."""
    B = x_t.shape[0]
    H, P, G, N = cfg.nheads, cfg.headdim, cfg.ngroups, cfg.d_state

    z, xBC_raw, dt_raw = _project_and_split(params, x_t, task, cfg, lora_cfg)
    xBC, new_conv = causal_conv1d_step(
        xBC_raw, cache.conv_state, params["conv"]["weight"], params["conv"]["bias"]
    )
    xs, Bm, Cm = _split_xbc(xBC, cfg)
    dt = _dt_activation(dt_raw, params["dt_bias"], cfg)  # (B, H)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    y, new_ssm = ssd_step(
        xs.reshape(B, H, P),
        dt,
        A,
        Bm.reshape(B, G, N),
        Cm.reshape(B, G, N),
        params["D"],
        cache.ssm_state,
    )
    y = y.reshape(B, cfg.d_inner)
    y = gated_rms_norm(y, z, params["norm"]["weight"], cfg.norm_eps)
    out = y @ params["out_proj"]["kernel"].astype(y.dtype)
    return out, Mamba2Cache(conv_state=new_conv, ssm_state=new_ssm)
