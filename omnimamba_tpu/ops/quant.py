"""Weight-only int8 quantization for the decode path.

Single-chip batched decode of the 1.3B is HBM-bound on weight reads
(~2.9 GB bf16 per token step). Symmetric per-output-channel int8 halves
that: XLA fuses the int8->bf16 upcast into the matmul's weight read, and the
per-channel scale is applied to the matmul *output* (mathematically exact
for per-out-channel scales), so the only approximation is the 8-bit rounding
of the weights.

No reference analog (the reference serves bf16); this is a TPU-native
serving feature. Quantized entries replace ``{"kernel": w}`` with
``{"q": int8, "scale": f32}``; ``matmul_any``/``lookup_any`` dispatch on the
entry structure so model code is quantization-agnostic.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def quantize_linear(w: jax.Array, reduce_axes: Sequence[int]) -> Dict[str, jax.Array]:
    """Symmetric int8 with one scale per kept (output) channel.

    reduce_axes: the input/contraction axes of the kernel (e.g. (0,) for an
    (in, out) kernel; (1,) for stacked (L, in, out)).
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": jnp.squeeze(scale, axis=tuple(reduce_axes))}


def is_quantized(entry: Dict) -> bool:
    return isinstance(entry, dict) and "q" in entry


def matmul_any(x: jax.Array, entry, *, transpose: bool = False, out_dtype=None) -> jax.Array:
    """x @ kernel (or kernel.T), dense or quantized.

    entry: array | {"kernel": w} | {"q","scale"}; quantized kernels upcast in
    the matmul and scale on the output (per-out-channel => exact refactoring).
    With ``transpose`` the kernel is (out, in)-like tables (weight-tied
    heads): scale is per *row* and still lands on the output axis.
    """
    out_dtype = out_dtype or x.dtype
    if isinstance(entry, dict) and "kernel" in entry:
        entry = entry["kernel"]  # {"kernel": array | {"q","scale"}}
    if isinstance(entry, dict):
        # A fused Pallas int8 matmul exists (ops/quant_pallas.py) but is
        # OPT-IN only: measured in the full 48-layer decode step it acts as
        # a fusion barrier and LOSES to XLA's inline dequant (979 vs 2048
        # tok/s at B=16) — per-op kernels don't pipeline across the layer
        # scan. Enable for isolated large matmuls via OMNIMAMBA_PALLAS_INT8.
        import os

        if (
            os.environ.get("OMNIMAMBA_PALLAS_INT8") == "1"
            and x.ndim == 2
            and jax.default_backend() == "tpu"
            and (x.shape[0] == 1 or x.shape[0] % 8 == 0)
            and x.shape[0] <= 256
        ):
            from omnimamba_tpu.ops.quant_pallas import qmatmul_pallas

            return qmatmul_pallas(
                x, entry["q"], entry["scale"], transpose=transpose
            ).astype(out_dtype)
        k = entry["q"]
        k = k.T if transpose else k
        y = jnp.einsum(
            "...i,io->...o", x, k.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y * entry["scale"].astype(jnp.float32)).astype(out_dtype)
    w = entry.T if transpose else entry
    return jnp.einsum(
        "...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(out_dtype)


def lookup_any(entry, ids: jax.Array, dtype) -> jax.Array:
    """Embedding-table row lookup, dense or per-row-quantized."""
    if isinstance(entry, dict) and "q" in entry:
        rows = entry["q"][ids].astype(dtype)
        return rows * entry["scale"][ids][..., None].astype(dtype)
    table = entry["kernel"] if isinstance(entry, dict) else entry
    return table[ids].astype(dtype)


# ---------------------------------------------------------------------------
# whole-model quantization for decode
# ---------------------------------------------------------------------------

# paths quantized for serving: the per-step weight traffic dominators
_QUANT_RULES = [
    # (path substring, contraction axes given the stacked leading layer dim)
    ("layers/mixer/in_proj/", (1,)),
    ("layers/mixer/out_proj/kernel", (1,)),
]
_QUANT_TABLES = ["mamba/embedding", "img_embeddings/word_embeddings"]
_QUANT_MLPS = [
    "img_embeddings/project_in/fc1/kernel",
    "img_embeddings/project_in/fc2/kernel",
    "img_embeddings/project_in/fc3/kernel",
]


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
    return "/".join(parts)


def quantize_decode_params(params: Dict) -> Dict:
    """Return params with the decode-dominant kernels int8-quantized.

    Structure-preserving: quantized leaves become {"q","scale"} subtrees at
    the same positions; ``matmul_any``/``lookup_any`` in the model consume
    either form, so the same forward code serves both.
    """

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}/{k}" if prefix else k
                if isinstance(v, jnp.ndarray) or hasattr(v, "shape"):
                    out[k] = _maybe_quant_leaf(p, v)
                else:
                    out[k] = walk(v, p)
            return out
        return tree

    def _maybe_quant_leaf(path, leaf):
        for pat, axes in _QUANT_RULES:
            if pat in path:
                return quantize_linear(leaf, axes)
        for pat in _QUANT_TABLES:
            if path.startswith(pat) or path.endswith(pat.split("/")[-1]):
                if path.endswith("embedding") or "word_embeddings" in path:
                    return quantize_linear(leaf, (1,))  # (V, d): per-row
        for pat in _QUANT_MLPS:
            if pat in path:
                return quantize_linear(leaf, (0,))
        return leaf

    return walk(params)


def fuse_in_proj(params: Dict) -> Dict:
    """Serving-only transform: concatenate each layer's four in_proj column
    slices (z|x|bc|dt — the reference's fused matrix order,
    mixer_seq_simple.py in_proj) back into ONE matmul operand.

    The split storage exists so 'tp' can head-shard the parts
    (parallel/sharding.py); for single-host DECODE it costs four matmul
    dispatches per layer where one suffices — at B=1 the per-op overhead of
    the 48-layer scan is the dominant tax over the weight-bandwidth floor.
    Works on dense kernels and int8 {"q","scale"} entries (scales are
    per-output-column, so concatenation is exact). Memory-neutral: the part
    entries are REPLACED by the fused entry.

    Returns a new params tree; accepts either the backbone tree or the
    {"mamba": ...} wrapper. Heterogeneous (list) layer stacks are fused
    per layer.
    """

    def fuse_entry(ip: Dict) -> Dict:
        parts = ("z", "x", "bc", "dt")
        entries = [ip[p] for p in parts]
        if all(isinstance(e, dict) and "q" in e for e in entries):
            fused = {
                "q": jnp.concatenate([e["q"] for e in entries], axis=-1),
                "scale": jnp.concatenate([e["scale"] for e in entries], axis=-1),
            }
        else:
            arrs = [
                e["kernel"] if isinstance(e, dict) and "kernel" in e else e
                for e in entries
            ]
            fused = jnp.concatenate(arrs, axis=-1)
        return {"fused": fused}

    def fuse_layer(layer: Dict) -> Dict:
        mixer = dict(layer["mixer"])
        if "in_proj" in mixer and "z" in mixer["in_proj"]:
            mixer["in_proj"] = fuse_entry(mixer["in_proj"])
        return {**layer, "mixer": mixer}

    out = dict(params)
    tree = out
    if "mamba" in out and isinstance(out["mamba"], dict):
        out["mamba"] = dict(out["mamba"])
        tree = out["mamba"]
    layers = tree.get("layers")
    if isinstance(layers, (list, tuple)):
        tree["layers"] = type(layers)(fuse_layer(l) for l in layers)
    elif isinstance(layers, dict):
        tree["layers"] = fuse_layer(layers)
    return out


def quantize_ssm_state(state: jax.Array) -> Dict[str, jax.Array]:
    """Scaled-int8 SSM decode state: per-(batch, head, P-row) symmetric
    scale over the d_state axis.

    Bytes vs bf16: 0.5x for q + 4/(2N) for the scale (~1.6% at N=128) —
    the batched-decode DMA ceiling is set by exactly this traffic. Unlike
    fp8 (measured NEGATIVE on v5e — no native fp8, emulated converts cost
    more than the saved bandwidth), int8<->f32 converts are native ops.
    Requantization error does NOT compound across decode steps: the decay
    factor exp(dt*A) < 1 contracts the carried error geometrically, so the
    total stays a small multiple of one rounding step (simulated over 256
    steps: max relative y error ~9% vs bf16-state's ~3.4% on random
    dynamics; bounded, flat in t).

    LAYOUT MATTERS: the scale is stored SQUEEZED, shape (..., P) — not
    keepdims (..., P, 1). XLA:TPU pads a buffer's minor dim to 128 lanes,
    so a (B, H, P, 1) fp32 scale carried through the decode while_loop
    occupies B*H*P*128*4 bytes in HBM — at 1.3B/B=96 that is ~201 MB/layer,
    4x the int8 tensor it scales, and the first measurement of this path
    (r4 queue, keepdims layout) LOST to bf16 state at every batch
    (B=96: 2123 vs 3621 tok/s) on exactly that padded-scale traffic.
    Squeezed, the scale is ~3 MB/layer. The d_state=64 decode null from
    the same queue (3644 vs 3621 tok/s) is the same lane-padding physics:
    shrinking a minor dim below 128 saves no HBM bytes.
    """
    sf = state.astype(jnp.float32)
    scale = jnp.max(jnp.abs(sf), axis=-1) / 127.0 + 1e-20
    q = jnp.round(sf / scale[..., None]).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_ssm_state(state) -> jax.Array:
    """fp32 view of an SSM state in either representation."""
    if isinstance(state, dict):
        return state["q"].astype(jnp.float32) * state["scale"][..., None]
    return state.astype(jnp.float32)
