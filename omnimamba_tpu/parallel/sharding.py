"""Sharding rules: params + batch onto the (dp, fsdp, tp) mesh.

Pattern-based PartitionSpec assignment over the OmniMamba params pytree.
The specs implement Megatron-style head parallelism for Mamba-2:

- in_proj z/x/dt column-parallel over heads ('tp' on the output axis),
  bc (B/C, shared across heads at ngroups=1) replicated;
- depthwise conv on x sharded with its channels;
- the SSD scan is embarrassingly parallel over heads => no comm inside;
- gated-RMSNorm reduces over d_inner => one tiny psum (GSPMD-inserted);
- out_proj row-parallel => psum back to the replicated residual stream;
- big embedding tables sharded on 'fsdp' (ZeRO-3 style, all-gathered on use).

Everything else (norms, pos tables, small vectors) is replicated. XLA/GSPMD
inserts all collectives; nothing here calls psum by hand (scaling-book
recipe: pick a mesh, annotate, let the compiler place collectives).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ordered pattern -> spec-builder; first match wins. Paths are
# "/"-joined key names, layer-stacked arrays keep their leading axis None.
_RULES = [
    # --- mamba mixer (stacked: leading layer axis) -------------------------
    # int8 bundles: q keeps the kernel spec; per-out-channel scales shard
    # with the output axis
    ("layers/mixer/in_proj/z/scale", P(None, "tp")),
    ("layers/mixer/in_proj/x/scale", P(None, "tp")),
    ("layers/mixer/out_proj/kernel/scale", P()),
    ("layers/mixer/in_proj/z", P(None, "fsdp", "tp")),
    ("layers/mixer/in_proj/x", P(None, "fsdp", "tp")),
    ("layers/mixer/in_proj/dt", P(None, "fsdp", None)),
    ("layers/mixer/in_proj/bc", P(None, "fsdp", None)),
    ("layers/mixer/lora", P()),  # r=8 — replicate
    ("layers/mixer/conv/weight_x", P(None, None, "tp")),
    ("layers/mixer/conv/bias_x", P(None, "tp")),
    ("layers/mixer/conv/weight_bc", P()),
    ("layers/mixer/conv/bias_bc", P()),
    ("layers/mixer/dt_bias", P()),
    ("layers/mixer/A_log", P()),
    ("layers/mixer/D", P()),
    ("layers/mixer/norm", P(None, "tp")),
    ("layers/mixer/out_proj", P(None, "tp", "fsdp")),
    ("layers/norm", P()),
    # --- embeddings / heads ------------------------------------------------
    ("mamba/embedding", P("fsdp", None)),
    ("img_embeddings/word_embeddings", P("fsdp", None)),
    ("img_embeddings/project_in/fc1", P(None, "tp")),
    ("img_embeddings/project_in/fc2/kernel", P("tp", None)),
    ("img_embeddings/project_in", P()),
    ("pos_embed", P()),
    ("mmu_pos_embed", P()),
    ("caption_embed", P()),
    ("norm_f", P()),
    # --- projector -----------------------------------------------------
    ("projector/fc1/kernel", P(None, "tp")),
    ("projector/fc2/kernel", P("tp", None)),
    ("projector", P()),
    # --- vision / vq: replicated (frozen in all reference stages) ----------
    ("vision", P()),
    ("vq", P()),
]


def _spec_for(path: str, ndim: int) -> P:
    for pat, spec in _RULES:
        if pat in path:
            if len(spec) > ndim:
                return P()  # bias/vector variant of a kernel rule
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Dict) -> Any:
    """NamedSharding pytree matching ``params``."""

    def make(path, leaf):
        spec = _spec_for(_path_str(path), leaf.ndim)
        # drop axes whose mesh size is 1? Not needed — GSPMD treats them as
        # replicated; but validate divisibility to fail loudly.
        for dim, ax in enumerate(spec):
            if ax is None:
                continue
            size = mesh.shape[ax] if isinstance(ax, str) else 1
            if leaf.shape[dim] % size != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(make, params)


def shard_params(mesh: Mesh, params: Dict) -> Dict:
    """Place a params pytree onto the mesh per the rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading dim on dp (the reference's DistributedSampler
    row split, trainer.py:50-57)."""
    return NamedSharding(mesh, P("dp"))
