"""Mamba-2 mixer — TPU-native replacement for ``mamba_ssm.modules.mamba2.Mamba2``.

The reference instantiates this (externally, mamba_ssm==2.2.2) per block via
``ssm_cfg={'layer': 'Mamba2'}`` (``models/stage2/config_mamba.py:16``,
``mixer_seq_simple.py:196-205``). Pipeline:

    in_proj (LoRA'd, reference lora.py:185)      -> [z | x | B | C | dt]
    depthwise causal conv + SiLU on [x|B|C]      -> x, B, C
    chunked SSD scan (h_t = e^{dt A} h + dt B x) -> y
    gated RMSNorm(y, z), out_proj                -> (B, L, d_model)

Train/prefill use the chunked SSD (``ops/ssd_chunked.py`` in XLA, or the
Pallas kernel in ``ops/ssd_pallas.py``); decode is the O(1) recurrent
``mamba2_step`` carrying (conv_state, ssm_state) — the TPU analog of
``causal_conv1d_update`` + ``selective_state_update``.

Tensor-parallel-first layout: the reference packs one fused
``in_proj: d -> 2*d_inner + 2*G*N + H`` (8512 for the 1.3B). A packed axis
cannot be head-sharded by GSPMD, so this framework stores the projection as
column slices of that same matrix:

    z  (d, d_inner)   -- shard heads on 'tp'
    x  (d, d_inner)   -- shard heads on 'tp'
    bc (d, 2*G*N)     -- replicated (ngroups=1: B/C shared across heads)
    dt (d, H)         -- shard heads on 'tp'

(the depthwise conv splits the same way: conv(x)++conv(B)++conv(C) ==
conv(x++B++C) for per-channel taps). Converters map the reference's fused
weights onto these slices losslessly (utils/convert.py). out_proj is
row-parallel; XLA inserts the psum. See parallel/sharding.py for the rules.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import LoraConfig, Mamba2LayerConfig
from omnimamba_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_step,
    conv_state_from_sequence,
)
from omnimamba_tpu.ops.norms import gated_rms_norm
from omnimamba_tpu.ops.quant import matmul_any
from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.ops.ssd_reference import ssd_scan_reference, ssd_step

_PARTS = ("z", "x", "bc", "dt")

# train-time x|bc|dt in_proj fusion experiment; see _project_parts
import os as _os

_FUSE_XBCDT = _os.environ.get("OMNIMAMBA_FUSE_INPROJ", "0") == "1"


class Mamba2Cache(NamedTuple):
    """Per-layer recurrent decode state (constant memory, no KV cache).

    Mirrors the (conv_state, ssm_state) pair the reference allocates via
    ``allocate_inference_cache`` (mixer_seq_simple.py:359-363). conv_state
    covers the concatenated [x|B|C] channels.
    """

    conv_state: jax.Array  # (B, W-1, d_conv_in) activation dtype
    ssm_state: jax.Array  # (B, H, P, N) fp32


def _part_dims(cfg: Mamba2LayerConfig) -> Dict[str, int]:
    return {
        "z": cfg.d_inner,
        "x": cfg.d_inner,
        "bc": 2 * cfg.ngroups * cfg.d_state,
        "dt": cfg.nheads,
    }


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
    k = jax.random.split(key, 12)
    d_model, d_inner = cfg.d_model, cfg.d_inner
    H, W = cfg.nheads, cfg.d_conv
    dims = _part_dims(cfg)

    bound_in = 1.0 / math.sqrt(d_model)
    in_proj = {
        part: jax.random.uniform(
            k[i], (d_model, dims[part]), dtype, minval=-bound_in, maxval=bound_in
        )
        for i, part in enumerate(_PARTS)
    }
    bound_out = 1.0 / math.sqrt(d_inner)
    out_proj = jax.random.uniform(
        k[4], (d_inner, d_model), dtype, minval=-bound_out, maxval=bound_out
    ) / math.sqrt(n_layer)

    # depthwise conv over [x|B|C]: torch Conv1d default, fan_in = kernel width
    bound_c = 1.0 / math.sqrt(W)
    d_bc = dims["bc"]
    conv = {
        "weight_x": jax.random.uniform(k[5], (W, d_inner), dtype, -bound_c, bound_c),
        "bias_x": jax.random.uniform(k[6], (d_inner,), dtype, -bound_c, bound_c),
        "weight_bc": jax.random.uniform(k[7], (W, d_bc), dtype, -bound_c, bound_c),
        "bias_bc": jax.random.uniform(k[8], (d_bc,), dtype, -bound_c, bound_c),
    }

    # dt_bias = softplus^-1(dt), dt ~ exp(U(log dt_min, log dt_max))
    u = jax.random.uniform(k[9], (H,), jnp.float32)
    dt = jnp.exp(u * (math.log(cfg.dt_max) - math.log(cfg.dt_min)) + math.log(cfg.dt_min))
    dt = jnp.maximum(dt, cfg.dt_init_floor)
    dt_bias = dt + jnp.log(-jnp.expm1(-dt))

    A_log = jnp.log(
        jax.random.uniform(
            k[10], (H,), jnp.float32, minval=cfg.a_init_min, maxval=cfg.a_init_max
        )
    )

    params = {
        "in_proj": in_proj,
        "conv": conv,
        "dt_bias": dt_bias.astype(dtype),
        "A_log": A_log.astype(dtype),
        "D": jnp.ones((H,), dtype),
        "norm": {"weight": jnp.ones((d_inner,), dtype)},
        "out_proj": {"kernel": out_proj},
    }
    if lora_cfg is not None:
        params["lora"] = _init_lora(k[11], lora_cfg, cfg, dtype)
    return params


def _init_lora(key, lora_cfg: LoraConfig, cfg: Mamba2LayerConfig, dtype) -> Dict:
    """Dual-task LoRA on the (split) in_proj: A (n, d, r) kaiming-uniform,
    per-part B (n, r, dim) zeros (reference lora.py:185-228, target
    'in_proj' only)."""
    dims = _part_dims(cfg)
    bound = 1.0 / math.sqrt(cfg.d_model)
    p: Dict = {}
    for i, task in enumerate(("t2i", "mmu")):
        ka = jax.random.fold_in(key, i)
        p[f"{task}_A"] = jax.random.uniform(
            ka, (lora_cfg.lora_nums, cfg.d_model, lora_cfg.r), dtype, -bound, bound
        )
        for part in _PARTS:
            p[f"{task}_B_{part}"] = jnp.zeros(
                (lora_cfg.lora_nums, lora_cfg.r, dims[part]), dtype
            )
    return p


def _project_parts(
    params: Dict,
    x: jax.Array,  # (..., d_model)
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig],
    dropout_key: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """in_proj (+task LoRA) producing the {z, x, bc, dt} column slices of the
    reference's fused projection.

    A params tree prepared with ``ops.quant.fuse_in_proj`` carries ONE
    concatenated operand under in_proj["fused"] (decode fast path: one
    matmul dispatch instead of four; column order z|x|bc|dt)."""
    ip = params["in_proj"]
    if "fused" in ip:
        full = matmul_any(x, ip["fused"])
        di, gn2 = cfg.d_inner, 2 * cfg.ngroups * cfg.d_state
        out = {
            "z": full[..., :di],
            "bc": full[..., 2 * di : 2 * di + gn2],
            "dt": full[..., 2 * di + gn2 :],
            "x": full[..., di : 2 * di],
        }
    elif _FUSE_XBCDT and all(
        not isinstance(ip[p], dict) for p in ("x", "bc", "dt")
    ):
        # train-time fusion experiment (OMNIMAMBA_FUSE_INPROJ=1): one
        # (d, d_inner+2GN+H) matmul instead of three. MEASURED NEGATIVE on
        # v5e-1 (r5): 430 ms / 26.7% MFU vs 345 / 33.3% proj_ssd baseline
        # at 1.3B B=8 — the per-layer weight concat re-materializes in the
        # backward and the fused operand defeats XLA's dgrad/wgrad fusion
        # choices; the narrow bc/dt dots it removes were never the cost.
        # Kept (default OFF) as the measured record.
        di, gn2 = cfg.d_inner, 2 * cfg.ngroups * cfg.d_state
        w = jnp.concatenate([ip["x"], ip["bc"], ip["dt"]], axis=-1)
        full = matmul_any(x, w)
        out = {
            "z": matmul_any(x, ip["z"]),
            "x": full[..., :di],
            "bc": full[..., di : di + gn2],
            "dt": full[..., di + gn2 :],
        }
    else:
        out = {part: matmul_any(x, ip[part]) for part in _PARTS}
    if task is not None and "lora" in params and lora_cfg is not None:
        lp = params["lora"]
        xl = x
        if dropout_key is not None and lora_cfg.dropout > 0.0:
            keep = jax.random.bernoulli(dropout_key, 1.0 - lora_cfg.dropout, x.shape)
            xl = jnp.where(keep, x / (1.0 - lora_cfg.dropout), 0.0).astype(x.dtype)
        scale = jnp.asarray(lora_cfg.scaling, x.dtype)
        for i in range(lora_cfg.lora_nums):
            h = xl @ lp[f"{task}_A"][i].astype(x.dtype)  # (..., r)
            for part in _PARTS:
                out[part] = out[part] + (h @ lp[f"{task}_B_{part}"][i].astype(x.dtype)) * scale
    # named so remat="proj"/"proj_xbd" (train.trainer) can pin these as
    # checkpoint residuals: the in_proj matmul is ~60% of a block's forward
    # FLOPs, and skipping its recompute costs only ~45 MB/layer at B=8 bf16.
    # z gets its own name: it is ~half the saved bytes but its recompute is
    # a single matmul, so "proj_xbd" drops it to fit bigger batches.
    from jax.ad_checkpoint import checkpoint_name

    return {
        k: checkpoint_name(v, "in_proj_z_out" if k == "z" else "in_proj_out")
        for k, v in out.items()
    }


def _dt_activation(dt_raw: jax.Array, dt_bias: jax.Array, cfg: Mamba2LayerConfig):
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    lo, hi = cfg.dt_limit
    if lo > 0.0 or hi < float("inf"):
        dt = jnp.clip(dt, lo, hi)
    return dt


def _split_bc(bc: jax.Array, cfg: Mamba2LayerConfig):
    gn = cfg.ngroups * cfg.d_state
    return bc[..., :gn], bc[..., gn:]


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
    initial_cache: Optional[Mamba2Cache] = None,
    valid_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Mamba2Cache]]:
    """Full-sequence forward (train / prefill).

    With ``return_cache=True`` also returns the final (conv, ssm) state so a
    decode loop can continue — the prefill path of generation
    (reference generation.py:241: prefill then 1-token steps).

    ``initial_cache`` continues from an existing decode state (the conv
    window becomes left context, the SSM scan starts from its state): a
    multi-token prefill *continuation* — one weight read for the whole
    window instead of one per token. The reference has no analog (its
    prefill always starts cold); this enables chunked prefill, prefix-cache
    serving, and the speculative-decode verify pass.

    ``valid_len`` (dynamic scalar) marks positions >= valid_len as padding:
    their dt is zeroed, making them EXACT no-ops for the SSM state (decay
    e^{0 A}=1, update dt*x*B=0), and the returned cache's conv window takes
    the last W-1 *real* inputs. Outputs at padded positions are garbage —
    callers mask. This lets a fixed-shape jitted program consume a
    variable-length window (the speculative verify loop).
    """
    B, L, _ = x.shape
    H, P, G, N = cfg.nheads, cfg.headdim, cfg.ngroups, cfg.d_state

    parts = _project_parts(params, x, task, cfg, lora_cfg, dropout_key)
    z = parts["z"]
    conv = params["conv"]
    halo_x = halo_bc = None
    if initial_cache is not None:
        halo_x = initial_cache.conv_state[..., : cfg.d_inner]
        halo_bc = initial_cache.conv_state[..., cfg.d_inner :]
    from jax.ad_checkpoint import checkpoint_name

    # named so remat="proj_conv_ssd" can pin the conv+silu outputs: the
    # backward then skips the conv-chain recompute too (~23 MB/layer at
    # B=8 L=329 bf16; see backbone.backbone_forward policy table)
    xs = checkpoint_name(
        causal_conv1d(
            parts["x"], conv["weight_x"], conv["bias_x"], initial_state=halo_x
        ),
        "conv_out",
    )
    # bc keeps its own name OUT of the proj_conv_ssd policy: pinning it too
    # was 38.8 MB over HBM at 1.3B B=8 (measured), and its recompute is one
    # small (d, 2GN) conv
    bc = checkpoint_name(
        causal_conv1d(
            parts["bc"], conv["weight_bc"], conv["bias_bc"], initial_state=halo_bc
        ),
        "conv_bc_out",
    )
    Bm, Cm = _split_bc(bc, cfg)
    dt = _dt_activation(parts["dt"], params["dt_bias"], cfg)
    if valid_len is not None:
        # scalar: one shared window length; (B,): RAGGED rows — each row's
        # padding is an exact SSM no-op, so right-padded batches of unequal
        # prompts prefill in one program with per-row-correct final states
        v = jnp.reshape(jnp.asarray(valid_len, jnp.int32), (-1, 1, 1))
        keep = jnp.arange(L)[None, :, None] < v
        dt = jnp.where(keep, dt, 0.0)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    xh = xs.reshape(B, L, H, P)
    Bh = Bm.reshape(B, L, G, N)
    Ch = Cm.reshape(B, L, G, N)

    init_state = initial_cache.ssm_state if initial_cache is not None else None
    if isinstance(init_state, dict):  # continuing from a scaled-int8 decode
        from omnimamba_tpu.ops.quant import dequantize_ssm_state

        init_state = dequantize_ssm_state(init_state)
    if scan_impl == "auto":
        # Pallas on TPU (fast compile, fused VMEM pipeline); XLA elsewhere.
        # Training paths pass "chunked" explicitly (differentiable).
        scan_impl = "pallas" if jax.default_backend() == "tpu" else "chunked"
    if init_state is not None and scan_impl in ("pallas", "pallas_ad"):
        # the Pallas kernels have no initial-state operand; continuation
        # windows are short, so the XLA chunked scan is the right tool
        scan_impl = "chunked"
    if scan_impl == "chunked":
        q = cfg.chunk_size
        if init_state is not None and L < q:
            # continuation windows are tiny (speculative verify: ~2K tokens);
            # a matched pow-2 chunk avoids padding the quadratic intra-chunk
            # attn to 256 wide (64x the FLOPs and a far slower XLA compile)
            q = max(16, 1 << (L - 1).bit_length())
        y, final_state = ssd_chunked(
            xh, dt, A, Bh, Ch, params["D"], chunk_size=q,
            initial_state=init_state,
        )
    elif scan_impl == "reference":
        y, final_state = ssd_scan_reference(
            xh, dt, A, Bh, Ch, params["D"], initial_state=init_state
        )
    elif scan_impl == "pallas":
        from omnimamba_tpu.ops.ssd_pallas import ssd_pallas

        # kernel chunk is an implementation detail (math-invariant); 512 is
        # ~1.5x faster than the mamba_ssm-parity 256 on v5e for long prefill,
        # while short prompts keep the smaller chunk (less padding)
        q = 512 if L >= 512 else cfg.chunk_size
        y, final_state = ssd_pallas(
            xh, dt, A, Bh, Ch, params["D"], chunk_size=max(cfg.chunk_size, q)
        )
    elif scan_impl == "pallas_ad":
        # differentiable fused kernel (custom VJP): training-capable Pallas.
        # Chunking is math-invariant, so pick the chunk that minimizes pad
        # waste, ties -> LARGER (fewer grid steps, shorter sequential state
        # chain: at the t2i length 329 both Q=128 and Q=384 pad to 384, and
        # Q=384 measures 2.77 vs 3.23 ms fwd+bwd per layer on v5e — full
        # step 361 vs 375 ms; scripts/profile_train.py ssd sweep).
        q = min(
            sorted({128, 256, 384, cfg.chunk_size}),
            key=lambda Q: (-(-L // Q) * Q, -Q),
        )
        from omnimamba_tpu.ops.ssd_pallas_bwd import ssd_pallas_ad

        y, final_state = ssd_pallas_ad(
            xh, dt, A, Bh, Ch, params["D"], q, cfg.bwd_head_tile, None
        )
        # named so remat="proj_ssd" (train.trainer) can pin the scan output
        # as a checkpoint residual: the backward then skips re-running the
        # Pallas forward entirely (see ssd_pallas_bwd._fwd for the matching
        # "ssd_resid" name on the chunk-states residual).
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, "ssd_out")
    else:
        raise ValueError(f"unknown scan_impl {scan_impl}")

    y = y.reshape(B, L, cfg.d_inner)
    y = gated_rms_norm(y, z, params["norm"]["weight"], cfg.norm_eps)
    out = matmul_any(y, params["out_proj"])

    cache = None
    if return_cache:
        xbc_raw = jnp.concatenate([parts["x"], parts["bc"]], axis=-1)
        if valid_len is None:
            init_conv = initial_cache.conv_state if initial_cache is not None else None
            conv_state = conv_state_from_sequence(
                xbc_raw, cfg.d_conv, initial_state=init_conv
            )
        else:
            # window ending at the last REAL token per row: full[v : v+W-1]
            W1 = cfg.d_conv - 1
            if initial_cache is not None:
                left = initial_cache.conv_state.astype(xbc_raw.dtype)
            else:
                left = jnp.zeros(
                    (B, W1, xbc_raw.shape[-1]), xbc_raw.dtype
                )
            full = jnp.concatenate([left, xbc_raw], axis=1)
            starts = jnp.broadcast_to(
                jnp.asarray(valid_len, jnp.int32), (B,)
            )
            conv_state = jax.vmap(
                lambda f, s: jax.lax.dynamic_slice_in_dim(f, s, W1, axis=0)
            )(full, starts)
        cache = Mamba2Cache(conv_state=conv_state, ssm_state=final_state)
    return out, cache


def mamba2_forward_sp_local(
    params: Dict,
    x: jax.Array,  # (B, Lloc, d_model) — this shard's sequence slice
    task: Optional[str],
    cfg: Mamba2LayerConfig,
    lora_cfg: Optional[LoraConfig] = None,
    *,
    axis: str,
    n_sp: int,
) -> jax.Array:
    """Sequence-parallel mixer forward for use INSIDE a shard_map over
    ``axis`` (long-context prefill, SURVEY §5.7): the causal conv pulls a
    (W-1)-token halo from the left neighbour via ppermute, and the SSD scan
    passes states across shards (parallel/sequence.ssd_sp_local)."""
    from omnimamba_tpu.parallel.sequence import halo_left, ssd_sp_local

    B, L, _ = x.shape
    H, P, G, N = cfg.nheads, cfg.headdim, cfg.ngroups, cfg.d_state

    parts = _project_parts(params, x, task, cfg, lora_cfg)
    z = parts["z"]
    conv = params["conv"]
    W = cfg.d_conv
    halo_x = halo_left(parts["x"], W - 1, axis, n_sp)
    halo_bc = halo_left(parts["bc"], W - 1, axis, n_sp)
    xs = causal_conv1d(
        parts["x"], conv["weight_x"], conv["bias_x"], initial_state=halo_x
    )
    bc = causal_conv1d(
        parts["bc"], conv["weight_bc"], conv["bias_bc"], initial_state=halo_bc
    )
    Bm, Cm = _split_bc(bc, cfg)
    dt = _dt_activation(parts["dt"], params["dt_bias"], cfg)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    y, _ = ssd_sp_local(
        xs.reshape(B, L, H, P),
        dt,
        A,
        Bm.reshape(B, L, G, N),
        Cm.reshape(B, L, G, N),
        params["D"],
        axis=axis,
        n_sp=n_sp,
        chunk_size=cfg.chunk_size,
    )
    y = y.reshape(B, L, cfg.d_inner)
    y = gated_rms_norm(y, z, params["norm"]["weight"], cfg.norm_eps)
    return matmul_any(y, params["out_proj"])


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

    parts = _project_parts(params, x_t, task, cfg, lora_cfg)
    z = parts["z"]
    xbc_raw = jnp.concatenate([parts["x"], parts["bc"]], axis=-1)
    conv = params["conv"]
    conv_w = jnp.concatenate([conv["weight_x"], conv["weight_bc"]], axis=-1)
    conv_b = jnp.concatenate([conv["bias_x"], conv["bias_bc"]], axis=-1)
    xBC, new_conv = causal_conv1d_step(xbc_raw, cache.conv_state, conv_w, conv_b)
    xs = xBC[..., : cfg.d_inner]
    Bm, Cm = _split_bc(xBC[..., cfg.d_inner :], cfg)
    dt = _dt_activation(parts["dt"], params["dt_bias"], cfg)  # (B, H)
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
    out = matmul_any(y, params["out_proj"])
    return out, Mamba2Cache(conv_state=new_conv, ssm_state=new_ssm)
