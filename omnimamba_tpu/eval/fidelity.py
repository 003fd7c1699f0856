"""Cross-implementation fidelity harness: greedy token-stream matching.

The BASELINE output-fidelity gate is "token-stream match vs reference
eager-scan greedy decode". This module provides:

- ``greedy_stream``: deterministic greedy decode with a chosen scan impl;
- ``compare_streams``: first-divergence report between two token streams;
- ``logit_margin_report``: how close the argmax was to flipping at each
  step — low margins flag positions where bf16 reordering could diverge
  (SURVEY §7.3 item 2).

Use against the reference by exporting its greedy tokens (teacher file) and
replaying with ``teacher_outputs`` for per-position logit comparison.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.config import MambaConfig
from omnimamba_tpu.models.backbone import apply_head, backbone_forward, backbone_step
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.sampling import SampleParams


class StreamDiff(NamedTuple):
    match: bool
    first_divergence: int  # -1 if identical
    n_compared: int
    mismatch_count: int


def greedy_stream(
    params: Dict,
    cfg: MambaConfig,
    input_ids: jax.Array,
    input_embeddings: jax.Array,
    task: str,
    max_length: int,
    scan_impl: str = "auto",
) -> np.ndarray:
    out = generate(
        params, cfg,
        input_ids=input_ids, input_embeddings=input_embeddings,
        task=task, max_length=max_length,
        sample=SampleParams(top_k=1), scan_impl=scan_impl,
    )
    return np.asarray(out.sequences)


def compare_streams(a: np.ndarray, b: np.ndarray) -> StreamDiff:
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    n = min(len(a), len(b))
    neq = a[:n] != b[:n]
    mismatches = int(neq.sum())
    first = int(np.argmax(neq)) if mismatches else -1
    return StreamDiff(
        match=mismatches == 0 and len(a) == len(b),
        first_divergence=first,
        n_compared=n,
        mismatch_count=mismatches,
    )


class FidelityPack(NamedTuple):
    """Recorded reference outputs, pre-staged so weight-level fidelity can
    be verified the moment real checkpoints (or a machine with the torch
    reference installed) become available — no network needed then.

    Contents per probe: prompt ids, the producer's greedy stream, and its
    fp32 logits over the first ``k_logits`` generated positions (argmax
    margins localize any divergence to a layer of numerics rather than a
    vague "streams differ")."""

    task: str
    prompt_ids: np.ndarray  # (B, L0)
    stream: np.ndarray  # (B, T) greedy sequence incl. prompt
    logits: np.ndarray  # (B, K, V) fp32, first K generated positions
    meta: Dict


def teacher_forced_logits(
    params: Dict,
    cfg: MambaConfig,
    input_embeddings: jax.Array,
    stream: np.ndarray,  # (B, T) token sequence incl. prompt — fed verbatim
    prompt_len: int,
    k_logits: int,
    task: str,
    *,
    scan_impl: str = "chunked",
) -> np.ndarray:
    """fp32 logits at the first ``k_logits`` generated positions while
    feeding the GIVEN stream's tokens (not this model's argmax) — every
    position is conditioned on the same prefix as the stream's producer,
    so logit deltas isolate layer-level numerics from prefix divergence."""
    hidden, cache = backbone_forward(
        params, input_embeddings, task, cfg,
        scan_impl=scan_impl, return_cache=True,
    )
    logits = [np.asarray(apply_head(params, hidden[:, -1], task), np.float32)]
    for t in range(prompt_len, min(prompt_len + k_logits - 1, stream.shape[1] - 1)):
        hidden, cache = backbone_step(
            params, jnp.asarray(stream[:, t]), jnp.int32(t), cache, task, cfg,
            dtype=input_embeddings.dtype,
        )
        logits.append(np.asarray(apply_head(params, hidden, task), np.float32))
    return np.stack(logits, axis=1)


def record_pack(
    params: Dict,
    cfg: MambaConfig,
    input_ids: jax.Array,
    input_embeddings: jax.Array,
    task: str,
    max_length: int,
    *,
    k_logits: int = 8,
    scan_impl: str = "chunked",
    meta: Dict | None = None,
) -> FidelityPack:
    """Record a pack from THIS implementation (cross-round regression /
    cross-impl diffing). For packs from the torch reference, write the same
    npz schema from its side (scripts/record_reference_pack.py documents
    the field names)."""
    stream = greedy_stream(
        params, cfg, input_ids, input_embeddings, task, max_length,
        scan_impl=scan_impl,
    )
    logits = teacher_forced_logits(
        params, cfg, input_embeddings, stream, input_ids.shape[1], k_logits,
        task, scan_impl=scan_impl,
    )
    return FidelityPack(
        task=task,
        prompt_ids=np.asarray(input_ids),
        stream=stream,
        logits=logits,
        meta=meta or {},
    )


def save_pack(path: str, pack: FidelityPack) -> None:
    import json

    np.savez(
        path,
        task=np.asarray(pack.task),
        prompt_ids=pack.prompt_ids,
        stream=pack.stream,
        logits=pack.logits,
        meta=np.asarray(json.dumps(pack.meta)),
    )


def load_pack(path: str) -> FidelityPack:
    import json

    z = np.load(path)
    return FidelityPack(
        task=str(z["task"]),
        prompt_ids=z["prompt_ids"],
        stream=z["stream"],
        logits=z["logits"],
        meta=json.loads(str(z["meta"])),
    )


def compare_to_pack(
    params: Dict,
    cfg: MambaConfig,
    pack: FidelityPack,
    input_embeddings: jax.Array,
    *,
    scan_impl: str = "chunked",
) -> Dict:
    """Replay the pack's prompt through THIS model; report stream diff and
    per-position max |logit delta| over the recorded window.

    The logit comparison TEACHER-FORCES the pack's recorded stream (not our
    own greedy continuation), so a delta at position t always compares
    logits conditioned on the identical prefix — deltas past a stream
    divergence still localize numerics rather than compounding the prefix
    difference."""
    our_stream = greedy_stream(
        params, cfg, jnp.asarray(pack.prompt_ids), input_embeddings,
        pack.task, pack.stream.shape[1], scan_impl=scan_impl,
    )
    diff = compare_streams(our_stream, pack.stream)
    our_logits = teacher_forced_logits(
        params, cfg, input_embeddings, np.asarray(pack.stream),
        pack.prompt_ids.shape[1], pack.logits.shape[1], pack.task,
        scan_impl=scan_impl,
    )
    k = min(our_logits.shape[1], pack.logits.shape[1])
    dl = np.abs(our_logits[:, :k] - pack.logits[:, :k]).max(axis=-1)
    return {
        "stream": diff,
        "max_logit_delta": dl,  # (B, K)
        "logits_close": bool((dl < 1e-3).all()),
    }


def logit_margin_report(
    params: Dict,
    cfg: MambaConfig,
    input_embeddings: jax.Array,
    token_stream: jax.Array,  # (B, T) full sequence incl. prompt
    task: str,
    prompt_len: int,
    scan_impl: str = "chunked",
) -> Dict[str, np.ndarray]:
    """Teacher-forced replay of a stream; per-step margin between the top-2
    logits (small margin => argmax unstable under numeric reordering)."""
    hidden, cache = backbone_forward(
        params, input_embeddings, task, cfg,
        scan_impl=scan_impl, return_cache=True,
    )
    logits = apply_head(params, hidden[:, -1], task)
    margins, agrees = [], []
    T = token_stream.shape[1]
    for t in range(prompt_len, T):
        top2 = jax.lax.top_k(logits, 2)[0]
        margins.append(np.asarray(top2[:, 0] - top2[:, 1]))
        agrees.append(np.asarray(jnp.argmax(logits, -1) == token_stream[:, t]))
        if t < T - 1:
            hidden, cache = backbone_step(
                params, token_stream[:, t], jnp.int32(t), cache, task, cfg,
                dtype=input_embeddings.dtype,
            )
            logits = apply_head(params, hidden, task)
    return {
        "margins": np.stack(margins, 1),
        "argmax_agrees": np.stack(agrees, 1),
    }


# ---------------------------------------------------------------------------
# VQ fidelity packs — recorded from the ACTUAL reference VQ model
# ---------------------------------------------------------------------------


class VQPack(NamedTuple):
    """Reference-side VQ tokenizer outputs for one image.

    Producer: ``scripts/record_reference_pack.py --vq`` runs the real
    ``llamagen_tokenizer/tokenizer_image/vq_model.py`` (importable on the
    CPU torch in this image) with deterministically seeded weights and
    records encode indices + the reconstructed image. Consumer:
    ``compare_vq_to_pack`` replays the same image through the JAX VQ built
    from the SAME seeded weights via ``utils/convert.convert_vq``.

    The image itself is not stored (derive it from ``image_path`` + the
    recorded preprocessing); recon is fp16 to keep the checked-in pack
    small."""

    indices: np.ndarray  # (B, h, w) int32 encode token grid
    recon: np.ndarray  # (B, H, W, 3) fp16 NHWC decoder output
    image_path: str  # source image, relative to the reference root
    size: int  # square resize applied before encoding
    meta: Dict


def save_vq_pack(path: str, pack: VQPack) -> None:
    import json

    np.savez_compressed(
        path,
        indices=pack.indices.astype(np.int32),
        recon=pack.recon.astype(np.float16),
        image_path=np.asarray(pack.image_path),
        size=np.asarray(pack.size),
        meta=np.asarray(json.dumps(pack.meta)),
    )


def load_vq_pack(path: str) -> VQPack:
    import json

    z = np.load(path)
    return VQPack(
        indices=z["indices"],
        recon=z["recon"],
        image_path=str(z["image_path"]),
        size=int(z["size"]),
        meta=json.loads(str(z["meta"])),
    )


def vq_pack_image(pack: VQPack, reference_root: str = "/root/reference") -> np.ndarray:
    """Rebuild the pack's input image exactly as the producer did:
    PIL RGB -> BICUBIC square resize -> [-1, 1] fp32 NHWC."""
    import os

    from PIL import Image

    path = os.path.join(reference_root, pack.image_path)
    pil = Image.open(path).convert("RGB").resize(
        (pack.size, pack.size), Image.BICUBIC
    )
    return (np.asarray(pil, np.float32) / 127.5 - 1.0)[None]


def compare_vq_to_pack(vq_params: Dict, vq_cfg, pack: VQPack, image: np.ndarray) -> Dict:
    """Encode+decode ``image`` with the JAX VQ and diff against the pack."""
    from omnimamba_tpu.models.vq import vq_decode, vq_encode

    out = vq_encode(vq_params, jnp.asarray(image), vq_cfg)
    idx = np.asarray(out.indices)
    recon = np.asarray(vq_decode(vq_params, np.asarray(out.quant), vq_cfg))
    idx_match = int((idx == pack.indices).sum())
    recon_err = float(np.abs(recon - pack.recon.astype(np.float32)).max())
    return {
        "indices_match": idx_match == pack.indices.size,
        "indices_agree": idx_match,
        "indices_total": int(pack.indices.size),
        "recon_max_err": recon_err,
        # fp16 storage quantizes the pack's recon at ~5e-4 granularity on
        # [-1,1]-scale values; 5e-3 leaves room for conv reassociation
        "recon_close": recon_err < 5e-3,
    }
