"""Optimizer + schedule + stage-dependent freezing.

Reference:
- AdamW betas (0.9, 0.95), weight decay 0 by default
  (``train_stage2.py:55-57``), applied through HF Trainer;
- decay only on params with dim >= 2 inside the mamba module
  (``trainer.py:152-158``);
- ``cosine_with_min_lr`` schedule with ``min_lr_rate=0.01`` and linear
  warmup (``train_stage2.py:41-42,54,60``);
- stage freezing (``omnimamba.py:119-188``):
    align:    vision+llm frozen; t2i trains img_embeddings/embedding/
              pos_embed/caption_embed/img_head(+tied)/LoRA; mmu trains
              projector + LoRA
    finetune: vision+vq frozen; whole mamba + projector train
    inference: everything frozen

Stacked-layer params carry a leading layer axis, so "dim >= 2" is evaluated
on the *logical* rank (ndim - 1 under ``layers/``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from omnimamba_tpu.config import TrainConfig


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
    return "/".join(parts)


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    peak = cfg.lr
    warmup = cfg.warmup_steps
    total = cfg.max_steps
    min_lr = peak * cfg.min_lr_rate

    if cfg.scheduler == "constant":
        return optax.constant_schedule(peak)
    if cfg.scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, max(warmup, 1)), optax.constant_schedule(peak)],
            [warmup],
        )
    if cfg.scheduler == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak, max(warmup, 1)),
                optax.linear_schedule(peak, 0.0, max(total - warmup, 1)),
            ],
            [warmup],
        )
    # cosine_with_min_lr (HF semantics: cosine from peak to min_lr)
    def cosine(step):
        step = jnp.minimum(step, total)
        if warmup > 0:
            warm = peak * step / warmup
        else:
            warm = peak
        progress = jnp.clip((step - warmup) / max(total - warmup, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (peak - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup, warm, cos)

    return cosine


def trainable_mask(params: Dict, stage: str, cfg: TrainConfig) -> Any:
    """True where the param trains in this stage (omnimamba.py:119-188)."""

    def decide(path, leaf) -> bool:
        p = _path_str(path)
        if p.startswith("vision") or p.startswith("vq"):
            return False  # frozen in every stage
        if stage == "inference":
            return False
        if stage == "finetune":
            return True  # whole mamba + projector (omnimamba.py:166-183)
        if stage == "align":
            if "lora" in p:
                return bool(cfg.t2i_task or cfg.mmu_task)
            if p.startswith("projector"):
                return bool(cfg.mmu_task)
            if cfg.t2i_task and any(
                s in p
                for s in ("img_embeddings", "caption_embed", "pos_embed", "embedding")
            ) and "mmu_pos_embed" not in p:
                return True
            return False
        raise ValueError(f"unknown stage {stage}")

    return jax.tree_util.tree_map_with_path(decide, params)


def decay_mask(params: Dict) -> Any:
    """Weight decay only on logical-rank >= 2 mamba params
    (trainer.py:152-158)."""

    def decide(path, leaf) -> bool:
        p = _path_str(path)
        if not p.startswith("mamba"):
            return False
        rank = leaf.ndim - 1 if "layers/" in p else leaf.ndim
        return rank >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(params: Dict, cfg: TrainConfig, stage: Optional[str] = None):
    """optax chain: grad-mask (freezing) -> adamw with decay mask -> schedule."""
    stage = stage or cfg.stage
    schedule = make_schedule(cfg)
    tmask = trainable_mask(params, stage, cfg)
    dmask = jax.tree.map(lambda t, d: bool(t and d), tmask, decay_mask(params))

    inner = optax.chain(
        # clip over trainable grads only (HF clips requires_grad params)
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=1e-8,
            weight_decay=cfg.decay,
            mask=dmask,
        ),
    )
    # optax.masked: frozen params get no optimizer state (MaskedNode) — in
    # the align stage that shrinks Adam moments from the full 1.3B to just
    # LoRA + embedding extras. masked() passes non-masked updates through
    # untouched, so frozen leaves are explicitly zeroed after.
    not_tmask = jax.tree.map(lambda t: not t, tmask)
    tx = optax.chain(
        optax.masked(inner, tmask),
        optax.masked(optax.set_to_zero(), not_tmask),
    )
    return tx, schedule, tmask
