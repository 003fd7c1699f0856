"""Mamba backbone: embeddings + 48 blocks + final norm + dual vocab heads.

TPU-native re-design of the reference ``MixerModel`` / ``MambaLMHeadModel``
(``models/stage2/mixer_seq_simple.py:265-524``):

- the 48 layers are *stacked* on a leading axis and driven by ``lax.scan``
  (one traced block instead of 48 — fast compiles, and the whole decode step
  fuses into a single XLA program, replacing the reference's CUDA-graph
  capture, generation.py:296-434);
- the task is a static argument selecting the LoRA branch and head — two
  compiled programs instead of the reference's Python-side
  ``set_lora_mode`` mutation (mixer_seq_simple.py:365-371);
- heads are weight-tied to their embedding tables (``tie_embeddings=True``,
  mixer_seq_simple.py:498-502) and always computed with fp32 accumulation so
  greedy argmax is stable in bf16.

Embedding extras (mixer_seq_simple.py:296-305):
- t2i: ``img_embeddings`` = 16384-vocab table + FusedMLP ``project_in``
  (GPT2Embeddings with word_embed_proj_dim=d_model, :56-64,297),
  learned ``pos_embed`` (1, 256+73, d), ``caption_embed`` MLP;
- mmu: ``mmu_pos_embed`` (1, 1500, d);
- text ``embedding`` (padded vocab).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import MambaConfig
from omnimamba_tpu.models.blocks import block_forward, block_step
from omnimamba_tpu.models.mamba2 import Mamba2Cache, init_cache, init_mamba2
from omnimamba_tpu.ops.norms import rms_norm
from omnimamba_tpu.ops.quant import lookup_any, matmul_any


def _linear_init(key, d_in, d_out, dtype, zero_bias=True, scale=1.0):
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(key, (d_in, d_out), dtype, minval=-bound, maxval=bound)
    w = w * scale
    b = jnp.zeros((d_out,), dtype) if zero_bias else None
    return {"kernel": w, "bias": b}


def _trunc_normal(key, shape, std, dtype):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape).astype(dtype)


def init_backbone(key: jax.Array, cfg: MambaConfig, dtype=jnp.float32) -> Dict:
    """Full parameter pytree; init distributions follow the reference
    (_init_weights, mixer_seq_simple.py:233-262: embeddings normal(0.02),
    linear biases zero, out_proj/fc2 rescaled 1/sqrt(n_layer))."""
    k = jax.random.split(key, 16)
    d = cfg.d_model
    params: Dict = {}

    params["embedding"] = 0.02 * jax.random.normal(
        k[0], (cfg.padded_vocab_size, d)
    ).astype(dtype)

    if cfg.t2i_task:
        params["img_embeddings"] = {
            "word_embeddings": 0.02
            * jax.random.normal(k[1], (cfg.vqvae_vocab_size, d)).astype(dtype),
            # FusedMLPProjector(d, d): d -> 4d -> d -> d, GELU between
            # (nn_utils.py:38-54); biases zeroed by _init_weights
            "project_in": {
                "fc1": _linear_init(k[2], d, 4 * d, dtype),
                "fc2": _linear_init(k[3], 4 * d, d, dtype),
                "fc3": _linear_init(k[4], d, d, dtype),
            },
        }
        params["pos_embed"] = _trunc_normal(k[5], (1, cfg.t2i_pos_len, d), 0.02, dtype)
        # CaptionEmbedder MLP: fc1/fc2 no bias, gelu(tanh); fc2 rescaled
        # (matches _init_weights hitting name "fc2.weight")
        params["caption_embed"] = {
            "fc1": {"kernel": _linear_init(k[6], d, d, dtype)["kernel"], "bias": None},
            "fc2": {
                "kernel": _linear_init(k[7], d, d, dtype, scale=1.0 / math.sqrt(cfg.n_layer))["kernel"],
                "bias": None,
            },
        }
    if cfg.mmu_task:
        params["mmu_pos_embed"] = _trunc_normal(
            k[8], (1, cfg.mmu_pos_len, d), 0.02, dtype
        )

    layer_keys = jax.random.split(k[9], cfg.n_layer)
    n_res = 1 if cfg.d_intermediate == 0 else 2

    def make_layer(i):
        if i in cfg.attn_layer_idx:
            from omnimamba_tpu.ops.attention import init_mha

            layer = {
                "norm": {"weight": jnp.ones((d,), dtype)},
                "mixer": init_mha(layer_keys[i], d, dtype),
            }
        else:
            layer = {
                "norm": {"weight": jnp.ones((d,), dtype)},
                "mixer": init_mamba2(
                    layer_keys[i], cfg.mixer, cfg.lora, cfg.n_layer, dtype
                ),
            }
        if cfg.d_intermediate > 0:
            from omnimamba_tpu.ops.attention import init_gated_mlp

            layer["norm2"] = {"weight": jnp.ones((d,), dtype)}
            layer["mlp"] = init_gated_mlp(
                jax.random.fold_in(layer_keys[i], 1), d, cfg.d_intermediate, dtype
            )
            # GPT-2 rescale of fc2 with 2 residuals/layer (mixer_seq_simple
            # _init_weights: n_residuals_per_layer=2 when MLP present)
            layer["mlp"]["fc2"]["kernel"] = layer["mlp"]["fc2"]["kernel"] / jnp.sqrt(
                jnp.asarray(n_res * cfg.n_layer, dtype)
            )
        return layer

    layers = [make_layer(i) for i in range(cfg.n_layer)]
    if cfg.attn_layer_idx:
        params["layers"] = layers  # heterogeneous: keep as a list
    else:
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    params["norm_f"] = {"weight": jnp.ones((d,), dtype)}
    return params


# ---------------------------------------------------------------------------
# embedding helpers
# ---------------------------------------------------------------------------


def _fused_mlp(p: Dict, x: jax.Array) -> jax.Array:
    """FusedMLPProjector forward (nn_utils.py:43-49): Lin-GELU-Lin-GELU-Lin."""
    h = matmul_any(x, p["fc1"]["kernel"]) + p["fc1"]["bias"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = matmul_any(h, p["fc2"]["kernel"]) + p["fc2"]["bias"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = matmul_any(h, p["fc3"]["kernel"]) + p["fc3"]["bias"].astype(x.dtype)
    return h


def embed_text(params: Dict, ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return lookup_any(params["embedding"], ids, dtype)


def embed_image_tokens(params: Dict, ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """img_embeddings: table lookup + FusedMLP project_in
    (GPT2Embeddings.forward, mixer_seq_simple.py:73-88 with project_in)."""
    e = lookup_any(params["img_embeddings"]["word_embeddings"], ids, dtype)
    return _fused_mlp(params["img_embeddings"]["project_in"], e)


def caption_embed(params: Dict, x: jax.Array) -> jax.Array:
    """CaptionEmbedder MLP (mixer_seq_simple.py:125-164): gelu(tanh)."""
    p = params["caption_embed"]
    h = x @ p["fc1"]["kernel"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    return h @ p["fc2"]["kernel"].astype(x.dtype)


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------


class BackboneCache(NamedTuple):
    """Stacked per-layer decode state: leading axis = layer."""

    conv_state: jax.Array  # (n_layer, B, W-1, d_conv_in)
    ssm_state: jax.Array  # (n_layer, B, H, P, N) fp32


def init_backbone_cache(cfg: MambaConfig, batch: int, dtype=jnp.bfloat16) -> BackboneCache:
    one = init_cache(batch, cfg.mixer, dtype)
    return BackboneCache(
        conv_state=jnp.broadcast_to(
            one.conv_state[None], (cfg.n_layer,) + one.conv_state.shape
        ).astype(dtype),
        ssm_state=jnp.broadcast_to(
            one.ssm_state[None], (cfg.n_layer,) + one.ssm_state.shape
        ),
    )


def backbone_forward(
    params: Dict,
    embeddings: jax.Array,  # (B, L, d)
    task: str,
    cfg: MambaConfig,
    *,
    add_mmu_pos: bool = True,
    scan_impl: str = "chunked",
    return_cache: bool = False,
    dropout_key: Optional[jax.Array] = None,
    remat: bool = False,
    attn_max_len: Optional[int] = None,
    initial_cache: Optional[BackboneCache] = None,
    valid_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[BackboneCache]]:
    """Full-sequence forward over all layers -> final-normed hidden states.

    Mirrors MixerModel.forward's embeddings-in branch
    (mixer_seq_simple.py:378-386,404-437): mmu adds mmu_pos_embed[:, :L];
    t2i positions were already added by the caller. A heterogeneous layer
    list (attn_layer_idx) takes the Python-loop path; the homogeneous stack
    runs under lax.scan.

    ``initial_cache``/``valid_len``: continuation prefill — run a whole
    token window from an existing decode state in ONE weight read (see
    mamba2.mamba2_forward). Homogeneous Mamba2 stacks only. Callers embed
    positions themselves (pass add_mmu_pos=False for mmu windows).
    """
    B, L, d = embeddings.shape
    h = embeddings
    if task == "mmu" and add_mmu_pos:
        pe = params["mmu_pos_embed"][:, :L].astype(h.dtype)
        if pe.shape[1] < L:
            # beyond the 1500-entry table (mixer_seq_simple.py:301-303) the
            # positions carry no learned signal — long-context prefill pads
            # with zeros (decode clamps to the last entry). The reference
            # would crash here; warn once per compile about the divergence.
            import logging

            logging.getLogger("omnimamba").warning(
                "mmu sequence length %d exceeds the %d-entry mmu_pos_embed "
                "table; positions beyond it get ZERO positional signal "
                "(reference would index-error — mixer_seq_simple.py:398-402)",
                L, pe.shape[1],
            )
            pe = jnp.pad(pe, ((0, 0), (0, L - pe.shape[1]), (0, 0)))
        h = h + pe

    residual = jnp.zeros_like(h, dtype=jnp.float32)

    if isinstance(params["layers"], (list, tuple)):
        assert initial_cache is None and valid_len is None, (
            "continuation prefill supports homogeneous Mamba2 stacks only"
        )
        return _het_forward(
            params, h, residual, task, cfg,
            scan_impl=scan_impl, return_cache=return_cache,
            dropout_key=dropout_key, attn_max_len=attn_max_len,
            out_dtype=embeddings.dtype,
        )

    if dropout_key is not None:
        dropout_keys = jax.random.split(dropout_key, cfg.n_layer)
    else:
        dropout_keys = None

    xs_in = {"layer": params["layers"]}
    if dropout_keys is not None:
        xs_in["dkey"] = dropout_keys
    if initial_cache is not None:
        xs_in["icache"] = Mamba2Cache(
            conv_state=initial_cache.conv_state,
            ssm_state=initial_cache.ssm_state,
        )

    def body(carry, xs):
        h, residual = carry
        out, new_residual, cache = block_forward(
            xs["layer"],
            h,
            residual,
            task,
            cfg.mixer,
            cfg.lora,
            norm_eps=cfg.norm_eps,
            scan_impl=scan_impl,
            return_cache=return_cache,
            dropout_key=xs.get("dkey"),
            initial_cache=xs.get("icache"),
            valid_len=valid_len,
        )
        emit = cache if return_cache else None
        return (out, new_residual), emit

    if remat:
        # rematerialize each block on backward: trades FLOPs for HBM on the
        # 48-layer scan (jax.checkpoint over the scanned body).
        # remat="proj" keeps the in_proj outputs (checkpoint_name'd in
        # mamba2._project_parts, ~45 MB/layer at B=8 L=329 bf16 = 2.1 GB at
        # 1.3B) so the backward recompute skips the block's dominant matmul;
        # remat="dots" keeps EVERY matmul output (OOMs at 1.3B B=8 on one
        # v5e chip — measured; fine for small models).
        policy = None
        if remat == "proj":
            policy = jax.checkpoint_policies.save_only_these_names(
                "in_proj_out", "in_proj_z_out"
            )
        elif remat == "proj_xbd":
            # keep x/bc/dt only; z (~half the bytes) recomputes as ONE
            # matmul — the middle rung between "proj" and full remat
            policy = jax.checkpoint_policies.save_only_these_names("in_proj_out")
        elif remat == "proj_ssd":
            # proj_xbd + the SSD scan's output and residual chunk-states:
            # the backward then reuses them instead of re-running the Pallas
            # forward (only the cheap conv/dt-activation chain recomputes).
            # Saving "ssd_in" too (the kernel's post-conv inputs) would also
            # skip that chain but duplicates x (+1.2 GB at 1.3B B=8 — OOMs
            # on one v5e); the named values exist for bigger-HBM setups.
            policy = jax.checkpoint_policies.save_only_these_names(
                "in_proj_out", "ssd_out", "ssd_resid"
            )
        elif remat == "proj_conv_ssd":
            # proj_ssd + the conv+silu outputs (mamba2 "conv_out"): backward
            # skips the conv-chain recompute as well — +~1.1 GB at 1.3B B=8
            # (23 MB/layer), for setups with the HBM headroom
            policy = jax.checkpoint_policies.save_only_these_names(
                "in_proj_out", "conv_out", "ssd_out", "ssd_resid"
            )
        elif remat == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)

    # NOTE: unrolling this layer scan is a measured NEGATIVE for training
    # too (1.3B B=8 proj_ssd step: unroll=1 345.5 ms / 33.2% MFU, unroll=2
    # 402.7 / 28.5%, unroll=4 474.2 / 24.2%) — the hoped-for win was
    # amortizing the per-layer DUS writes that stack checkpoint residuals
    # (~24 ms of the step), but XLA's scan slab streaming beats its
    # scheduling of the widened body, same physics as the decode-step
    # result at :493.
    (h, residual), caches = jax.lax.scan(body, (h, residual), xs_in)

    final = rms_norm(
        (h.astype(jnp.float32) + residual), params["norm_f"]["weight"], cfg.norm_eps
    ).astype(embeddings.dtype)

    out_cache = None
    if return_cache:
        out_cache = BackboneCache(
            conv_state=caches.conv_state, ssm_state=caches.ssm_state
        )
    return final, out_cache


def _het_forward(
    params, h, residual, task, cfg, *, scan_impl, return_cache,
    dropout_key, attn_max_len, out_dtype,
):
    caches = []
    for i, layer_params in enumerate(params["layers"]):
        lt = "mha" if i in cfg.attn_layer_idx else "mamba2"
        dkey = (
            jax.random.fold_in(dropout_key, i) if dropout_key is not None else None
        )
        h, residual, cache = block_forward(
            layer_params, h, residual, task, cfg.mixer, cfg.lora,
            norm_eps=cfg.norm_eps, scan_impl=scan_impl,
            return_cache=return_cache, dropout_key=dkey,
            layer_type=lt, attn_num_heads=cfg.attn_num_heads,
            attn_rotary_dim=cfg.attn_rotary_dim, attn_max_len=attn_max_len,
        )
        caches.append(cache)
    final = rms_norm(
        (h.astype(jnp.float32) + residual), params["norm_f"]["weight"], cfg.norm_eps
    ).astype(out_dtype)
    return final, (caches if return_cache else None)


def _het_step(params, h, residual, caches, task, cfg, dtype):
    new_caches = []
    for i, layer_params in enumerate(params["layers"]):
        lt = "mha" if i in cfg.attn_layer_idx else "mamba2"
        h, residual, cache = block_step(
            layer_params, h, residual, caches[i], task, cfg.mixer, cfg.lora,
            norm_eps=cfg.norm_eps, layer_type=lt,
            attn_num_heads=cfg.attn_num_heads,
            attn_rotary_dim=cfg.attn_rotary_dim,
        )
        new_caches.append(cache)
    final = rms_norm(
        (h.astype(jnp.float32) + residual), params["norm_f"]["weight"], cfg.norm_eps
    ).astype(dtype)
    return final, new_caches


def _decode_embed(params, token_ids, pos, task, cfg, dtype):
    """Per-task next-token embedding + positional gather
    (ids-in branch, mixer_seq_simple.py:387-402).

    ``pos`` may be a scalar (all rows at the same position) or a (B,)
    vector (ragged batches: each row at its own absolute position)."""
    pos_v = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32), (token_ids.shape[0],)
    )
    if task == "t2i":
        h = embed_image_tokens(params, token_ids, dtype)
        pe = jnp.take(params["pos_embed"][0], pos_v, axis=0)  # (B, d)
        return h + pe.astype(dtype)
    if task == "mmu":
        h = embed_text(params, token_ids, dtype)
        pe = jnp.take(
            params["mmu_pos_embed"][0],
            jnp.minimum(pos_v, cfg.mmu_pos_len - 1),
            axis=0,
        )
        return h + pe.astype(dtype)
    raise ValueError(task)


def embed_decode_window(
    params: Dict,
    token_ids: jax.Array,  # (B, K)
    pos0: jax.Array,  # scalar int32: absolute position of token_ids[:, 0]
    task: str,
    cfg: MambaConfig,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Decode-style embeddings for a K-token window at positions
    pos0..pos0+K-1 (the batched form of _decode_embed) — feed to
    backbone_forward(..., add_mmu_pos=False, initial_cache=...) for a
    continuation prefill (e.g. the speculative-decode verify pass)."""
    K = token_ids.shape[1]
    pos = jnp.asarray(pos0, jnp.int32) + jnp.arange(K, dtype=jnp.int32)
    emb = jax.vmap(
        lambda ids, p: _decode_embed(params, ids, p, task, cfg, dtype),
        in_axes=(1, 0),
        out_axes=1,
    )(token_ids, pos)
    return emb


def backbone_step_fused(
    params: Dict,
    token_ids: jax.Array,  # (B,)
    pos: jax.Array,
    cache,  # ops.decode_fused.FusedDecodeCache
    task: str,
    cfg: MambaConfig,
    *,
    dtype=jnp.bfloat16,
    head_tile: int = 16,
):
    """backbone_step via the whole-model fused Pallas decode kernel
    (ops/decode_fused.py — replaces the lax.scan step; same semantics,
    no per-layer weight-slab copies). Homogeneous Mamba2 stacks only."""
    from omnimamba_tpu.ops.decode_fused import fused_decode_step

    h = _decode_embed(params, token_ids, pos, task, cfg, dtype)
    residual = jnp.zeros_like(h, dtype=jnp.float32)
    layers = params["layers"]
    lora = layers["mixer"].get("lora")
    if lora is not None and task is not None:
        lora_A = lora[f"{task}_A"]
        lora_B = {p: lora[f"{task}_B_{p}"] for p in ("z", "x", "bc", "dt")}
        scale = cfg.lora.scaling
    else:
        lora_A, lora_B, scale = None, None, 0.0
    h, residual, new_cache = fused_decode_step(
        layers, h, residual, cache, lora_A, lora_B, scale,
        head_tile=head_tile, norm_eps=cfg.norm_eps, gn_eps=cfg.mixer.norm_eps,
    )
    final = rms_norm(
        (h.astype(jnp.float32) + residual), params["norm_f"]["weight"], cfg.norm_eps
    ).astype(dtype)
    return final, new_cache


def backbone_step(
    params: Dict,
    token_ids: jax.Array,  # (B,) next-token ids
    pos: jax.Array,  # scalar int32 current position
    cache: BackboneCache,
    task: str,
    cfg: MambaConfig,
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, BackboneCache]:
    """One decode token through all layers (ids-in branch,
    mixer_seq_simple.py:387-402): per-task embedding + positional gather."""
    h = _decode_embed(params, token_ids, pos, task, cfg, dtype)

    residual = jnp.zeros_like(h, dtype=jnp.float32)

    if isinstance(params["layers"], (list, tuple)):
        return _het_step(params, h, residual, cache, task, cfg, dtype)

    def body(carry, xs):
        h, residual = carry
        layer_params, conv_state, ssm_state = xs
        out, new_residual, new_cache = block_step(
            layer_params,
            h,
            residual,
            Mamba2Cache(conv_state, ssm_state),
            task,
            cfg.mixer,
            cfg.lora,
            norm_eps=cfg.norm_eps,
        )
        return (out, new_residual), new_cache

    # NOTE: unrolling this scan (lax.scan unroll=8) was measured 2.5x
    # SLOWER at 1.3B B=1 decode (80 vs 201 tok/s bf16): the rolled scan's
    # slab streaming beats XLA's scheduling of the unrolled body.
    (h, residual), new_caches = jax.lax.scan(
        body, (h, residual), (params["layers"], cache.conv_state, cache.ssm_state)
    )
    final = rms_norm(
        (h.astype(jnp.float32) + residual), params["norm_f"]["weight"], cfg.norm_eps
    ).astype(dtype)
    return final, BackboneCache(new_caches.conv_state, new_caches.ssm_state)


def backbone_forward_sp(
    params: Dict,
    embeddings: jax.Array,  # (B, L, d) — L sharded over `axis` on `mesh`
    task: str,
    cfg: MambaConfig,
    mesh,
    *,
    axis: str = "sp",
    add_mmu_pos: bool = True,
) -> jax.Array:
    """Whole-model sequence-parallel prefill: every layer scans its local
    slice and passes SSM states across shards; conv halos ride ppermute
    (SURVEY §5.7 long-context strategy — no reference analog, its max
    context is 1500). Homogeneous (all-Mamba) stacks only.

    Returns final-normed hidden states, still L-sharded.
    """
    from jax.sharding import PartitionSpec as P

    from omnimamba_tpu.models.mamba2 import mamba2_forward_sp_local

    assert not cfg.attn_layer_idx, "sp prefill supports pure-SSM stacks"
    n_sp = mesh.shape[axis]
    from omnimamba_tpu.ops.norms import add_norm

    def shard_fn(params, emb_local):
        h = emb_local
        B, Lloc, d = h.shape
        if task == "mmu" and add_mmu_pos:
            idx = jax.lax.axis_index(axis)
            start = jnp.minimum(idx * Lloc, cfg.mmu_pos_len - Lloc)
            pe = jax.lax.dynamic_slice_in_dim(
                params["mmu_pos_embed"][0], start, Lloc, axis=0
            )
            h = h + pe[None].astype(h.dtype)
        residual = jnp.zeros_like(h, dtype=jnp.float32)

        def body(carry, layer_params):
            h, residual = carry
            normed, new_residual = add_norm(
                h, residual, layer_params["norm"]["weight"],
                eps=cfg.norm_eps, is_rms=True, residual_in_fp32=True, prenorm=True,
            )
            out = mamba2_forward_sp_local(
                layer_params["mixer"], normed, task, cfg.mixer, cfg.lora,
                axis=axis, n_sp=n_sp,
            )
            return (out, new_residual), None

        (h, residual), _ = jax.lax.scan(body, (h, residual), params["layers"])
        return rms_norm(
            (h.astype(jnp.float32) + residual), params["norm_f"]["weight"], cfg.norm_eps
        ).astype(emb_local.dtype)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(params, embeddings)


def apply_head(params: Dict, hidden: jax.Array, task: str) -> jax.Array:
    """Task-routed weight-tied head, fp32 accumulation
    (mixer_seq_simple.py:483-524: img_head for t2i, lm_head for mmu)."""
    if task == "t2i":
        table = params["img_embeddings"]["word_embeddings"]
    elif task == "mmu":
        table = params["embedding"]
    else:
        raise ValueError(task)
    return matmul_any(hidden, table, transpose=True, out_dtype=jnp.float32)
