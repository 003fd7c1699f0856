"""Dual-task LoRA as a *functional* switch.

The reference wraps every mixer's ``in_proj`` with a Linear carrying two
parallel LoRA branches (``t2i_lora_*`` / ``mmu_lora_*``) and mutates
``task_types`` on the module per forward (``models/stage2/lora.py:185-279``,
``mixer_seq_simple.py:365-371``). Mutation is not jittable; here the task is
a static argument, so each task compiles to its own XLA program (SURVEY §7.3
item 5) and the LoRA weight pair is selected at trace time.

Weights follow r=8, alpha=32, lora_nums=1, dropout=0.05 (train only),
A ~ kaiming-uniform, B = 0 (reference lora.py:80-96,221-228).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import LoraConfig

TASKS = ("t2i", "mmu")


def init_lora(
    key: jax.Array, cfg: LoraConfig, d_in: int, d_out: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """Params: {task}_A: (n, d_in, r) kaiming-uniform, {task}_B: (n, r, d_out) zeros."""
    params = {}
    bound = 1.0 / math.sqrt(d_in)  # kaiming_uniform(a=sqrt(5)) on (r, d_in)
    for i, task in enumerate(TASKS):
        ka = jax.random.fold_in(key, i)
        params[f"{task}_A"] = jax.random.uniform(
            ka, (cfg.lora_nums, d_in, cfg.r), dtype, minval=-bound, maxval=bound
        )
        params[f"{task}_B"] = jnp.zeros((cfg.lora_nums, cfg.r, d_out), dtype)
    return params


def lora_delta(
    params: Dict[str, jax.Array],
    x: jax.Array,  # (..., d_in)
    task: str,
    cfg: LoraConfig,
    *,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """scaling * B(A(dropout(x))) summed over lora_nums
    (reference lora.py:263-279)."""
    assert task in TASKS, task
    A = params[f"{task}_A"]
    B = params[f"{task}_B"]
    if dropout_key is not None and cfg.dropout > 0.0:
        keep = jax.random.bernoulli(dropout_key, 1.0 - cfg.dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0).astype(x.dtype)
    out = None
    for i in range(cfg.lora_nums):
        h = jnp.einsum("...d,dr->...r", x, A[i].astype(x.dtype))
        d = jnp.einsum("...r,ro->...o", h, B[i].astype(x.dtype))
        out = d if out is None else out + d
    return out * jnp.asarray(cfg.scaling, x.dtype)
