"""OmniMamba — the top-level unified MMU + T2I model composition.

Reference: ``models/omnimamba.py`` + ``models/mamba_vlm.py``. One shared
Mamba-2 backbone serves both tasks via decoupled vocab heads and task LoRA;
the MMU path splices DinoSigLIP+projector features into the text sequence,
the T2I path decodes 256 VQGAN tokens from a caption prefix.

Everything here is functional over one params pytree:

    params = {
      "mamba":     backbone (embeddings + 48 blocks + heads, backbone.py)
      "projector": vision->LLM FusedMLP                     (projector.py)
      "vision":    {"dino": ..., "siglip": ...}             (vit.py)
      "vq":        VQ-16 tokenizer                          (vq.py)
    }

Training-sequence layouts (the compatibility contract, SURVEY §3.5):
- T2I  (reference omnimamba.py:252-280): embeds = [cap_emb[:-1] | img(256) |
  cap_emb[-1:]] + pos_embed[:L]; labels = [ignore x 71 | image_ids | ignore];
  loss on shift-by-one (mamba_vlm.py:88-102) => image positions supervised.
- MMU  (reference omnimamba.py:190-249): embeds = [emb(<|mmu|><|soi|>) |
  729 projected patches | emb(<|eoi|><|sot|> text)]; labels ignore through
  <|sot|>; text-only rows substitute zero image embeddings.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.config import MambaConfig, VisionConfig, VQConfig
from omnimamba_tpu.models.backbone import (
    apply_head,
    backbone_forward,
    caption_embed,
    embed_image_tokens,
    embed_text,
    init_backbone,
)
from omnimamba_tpu.models.generation import GenerateOutput, generate
from omnimamba_tpu.models.projector import apply_projector, init_projector
from omnimamba_tpu.models.vit import dinosiglip_features, init_vit
from omnimamba_tpu.models.vq import init_vq, vq_decode_code
from omnimamba_tpu.ops.sampling import SampleParams

IGNORE_INDEX = -100  # HF/LLaMA convention (reference omnimamba.py:31)


class OmniMambaModel(NamedTuple):
    """Static configuration bundle for the functional API."""

    cfg: MambaConfig
    vision_cfg: VisionConfig
    vq_cfg: VQConfig
    sptids: Dict[str, int]
    projector_arch: str = "fused-gelu-mlp"


def init_omnimamba(
    key: jax.Array,
    model: OmniMambaModel,
    dtype=jnp.float32,
    *,
    with_vision: bool = True,
    with_vq: bool = True,
) -> Dict:
    ks = jax.random.split(key, 5)
    params: Dict = {"mamba": init_backbone(ks[0], model.cfg, dtype)}
    if model.cfg.mmu_task and with_vision:
        params["vision"] = {
            "dino": init_vit(ks[1], model.vision_cfg.dino, dtype),
            "siglip": init_vit(ks[2], model.vision_cfg.siglip, dtype),
        }
        params["projector"] = init_projector(
            ks[3],
            model.vision_cfg.embed_dim,
            model.cfg.d_model,
            model.projector_arch,
            dtype,
        )
    if model.cfg.t2i_task and with_vq:
        params["vq"] = init_vq(ks[4], model.vq_cfg, dtype)
    return params


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def cross_entropy(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Mean CE over non-ignored positions (torch CrossEntropyLoss semantics,
    reference omnimamba.py:63,276-279)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def _shift_and_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shift-by-one LM loss (mamba_vlm.py:96-101)."""
    return cross_entropy(logits[:, :-1], labels[:, 1:])


def t2i_loss(
    params: Dict,
    model: OmniMambaModel,
    image_ids: jax.Array,  # (B, 256) VQ token ids
    caption_ids: jax.Array,  # (B, 72): [<|t2i|> <|sot|> pad*/cap <|eot|> <|soi|>]
    *,
    dtype=jnp.bfloat16,
    dropout_key: Optional[jax.Array] = None,
    scan_impl: str = "chunked",  # or "pallas_ad" (fused custom-VJP kernel)
    remat: bool = False,
) -> jax.Array:
    """T2I training step loss (reference omnimamba.py:252-280)."""
    cfg = model.cfg
    img_emb = embed_image_tokens(params["mamba"], image_ids, dtype)  # (B,256,d)
    txt = embed_text(params["mamba"], caption_ids, dtype)
    txt = caption_embed(params["mamba"], txt)
    emb = jnp.concatenate([txt[:, :-1], img_emb, txt[:, -1:]], axis=1)

    B, n_cap = caption_ids.shape
    labels = jnp.concatenate(
        [
            jnp.full((B, n_cap - 1), IGNORE_INDEX, jnp.int32),
            image_ids.astype(jnp.int32),
            jnp.full((B, 1), IGNORE_INDEX, jnp.int32),
        ],
        axis=1,
    )
    L = emb.shape[1]
    emb = emb + params["mamba"]["pos_embed"][:, :L].astype(dtype)
    hidden, _ = backbone_forward(
        params["mamba"], emb, "t2i", cfg,
        scan_impl=scan_impl, dropout_key=dropout_key, remat=remat,
    )
    logits = apply_head(params["mamba"], hidden, "t2i")
    return _shift_and_ce(logits, labels)


def _mmu_wrap_ids(sptids: Dict[str, int], input_ids: jax.Array) -> jax.Array:
    """[<|mmu|> <|soi|> <|eoi|> <|sot|>] ++ text (omnimamba.py:190-199)."""
    B = input_ids.shape[0]

    def col(tok):
        return jnp.full((B, 1), sptids[tok], input_ids.dtype)

    return jnp.concatenate(
        [col("<|mmu|>"), col("<|soi|>"), col("<|eoi|>"), col("<|sot|>"), input_ids],
        axis=1,
    )


def mmu_embed_sequence(
    params: Dict,
    model: OmniMambaModel,
    input_ids: jax.Array,  # (B, T) text ids (starting at the question)
    image_features: jax.Array,  # (B, 729, d_model) projected patches (or zeros)
    labels: Optional[jax.Array] = None,  # (B, T) text labels
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Build the spliced MMU embedding sequence + labels
    (reference omnimamba.py:190-218 / 221-249 with zero features)."""
    wrapped = _mmu_wrap_ids(model.sptids, input_ids)
    text_emb = embed_text(params["mamba"], wrapped, dtype)
    emb = jnp.concatenate(
        [text_emb[:, :2], image_features.astype(dtype), text_emb[:, 2:]], axis=1
    )
    out_labels = None
    if labels is not None:
        B = input_ids.shape[0]
        n_img = image_features.shape[1]
        out_labels = jnp.concatenate(
            [
                jnp.full((B, 4 + n_img), IGNORE_INDEX, jnp.int32),
                labels.astype(jnp.int32),
            ],
            axis=1,
        )
    return emb, out_labels


def mmu_image_features(
    params: Dict, model: OmniMambaModel, pixel_values: Dict[str, jax.Array],
    remat: bool = False,
) -> jax.Array:
    """DinoSigLIP features -> projector (omnimamba.py:201-202)."""
    feats = dinosiglip_features(
        params["vision"]["dino"], params["vision"]["siglip"], pixel_values,
        model.vision_cfg, remat=remat,
    )
    return apply_projector(params["projector"], feats, model.projector_arch)


def mmu_loss(
    params: Dict,
    model: OmniMambaModel,
    pixel_values: Dict[str, jax.Array],  # dummy tensors for text-only rows
    input_ids: jax.Array,  # (B, T)
    labels: jax.Array,  # (B, T)
    multimodal_mask: jax.Array,  # (B,) bool: row has a real image
    *,
    dtype=jnp.bfloat16,
    dropout_key: Optional[jax.Array] = None,
    scan_impl: str = "chunked",  # or "pallas_ad" (fused custom-VJP kernel)
    remat: bool = False,
) -> jax.Array:
    """MMU training loss (reference omnimamba.py:281-307). Text-only rows get
    zero image embeddings (mmu_uni_ids2embed) — expressed here as a vectorized
    mask instead of the reference's per-group batch split, so shapes stay
    static under jit."""
    feats = mmu_image_features(params, model, pixel_values, remat=remat)
    feats = jnp.where(multimodal_mask[:, None, None], feats, 0.0)
    emb, full_labels = mmu_embed_sequence(
        params, model, input_ids, feats, labels, dtype=dtype
    )
    hidden, _ = backbone_forward(
        params["mamba"], emb, "mmu", model.cfg,
        scan_impl=scan_impl, dropout_key=dropout_key, remat=remat,
    )
    logits = apply_head(params["mamba"], hidden, "mmu")
    return _shift_and_ce(logits, full_labels)


def lm_loss(
    params: Dict,
    model: OmniMambaModel,
    input_ids: jax.Array,  # (B, T) from UniversalPrompting.lm_prompt
    labels: jax.Array,  # (B, T)
    *,
    dtype=jnp.bfloat16,
    dropout_key: Optional[jax.Array] = None,
    scan_impl: str = "chunked",
) -> jax.Array:
    """Pure language-modeling loss (the 'lm' task of UniversalPrompting,
    prompting_utils.py:168-202): text-only sequence through the mmu head,
    no image splice, no mmu positional table."""
    emb = embed_text(params["mamba"], input_ids, dtype)
    hidden, _ = backbone_forward(
        params["mamba"], emb, "mmu", model.cfg,
        add_mmu_pos=False, scan_impl=scan_impl, dropout_key=dropout_key,
    )
    logits = apply_head(params["mamba"], hidden, "mmu")
    return _shift_and_ce(logits, labels.astype(jnp.int32))


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def t2i_generate(
    params: Dict,
    model: OmniMambaModel,
    text_ids: jax.Array,  # (B, 72) caption block ids
    *,
    sample: SampleParams = SampleParams(top_k=1),
    key: Optional[jax.Array] = None,
    cfg_scale: Optional[float] = None,
    dtype=jnp.bfloat16,
    decode_image: bool = True,
    scan_impl: str = "auto",
    cache_dtype="auto",
    text_lengths: Optional[jax.Array] = None,  # (B,) ragged true caption-block lens
):
    """Caption ids -> 256 VQ tokens -> image (reference omnimamba.py:311-337).

    With ``cfg_scale``, text_ids must be packed [cond; uncond] along batch.
    Returns (images (B,256,256,3) | None, tokens (B,256)).

    ``text_lengths`` (B,): ragged batching for RAW (un-left-padded) caption
    blocks — text_ids right-padded to a bucket, row i's true block is its
    first text_lengths[i] ids. Each row's stream is exactly its B=1 stream.
    The reference's fixed 72-id block (inference_t2i.py:30-45) is the
    text_lengths=None case; ragged rows skip the left-pad context entirely,
    an extension for mixed-length serving. Incompatible with cfg_scale
    (generation.py ragged contract).
    """
    cfg = model.cfg
    emb = embed_text(params["mamba"], text_ids, dtype)
    emb = caption_embed(params["mamba"], emb)
    L0 = emb.shape[1]
    emb = emb + params["mamba"]["pos_embed"][:, :L0].astype(dtype)
    if text_lengths is not None:
        assert cfg_scale is None, "ragged t2i composes with plain sampling only"
        # decode positions are ragged, so the 256 image tokens of row i sit
        # at pos_embed[text_lengths[i] + t] exactly as in its solo run
        text_lengths = jnp.asarray(text_lengths, jnp.int32)

    out = generate(
        params["mamba"],
        cfg,
        input_ids=text_ids,
        input_embeddings=emb,
        task="t2i",
        max_length=L0 + cfg.num_tokens,
        sample=sample,
        key=key,
        cfg_scale=cfg_scale,
        scan_impl=scan_impl,
        cache_dtype=cache_dtype,
        prompt_lengths=text_lengths,
    )
    tokens = out.sequences[:, L0:]
    if cfg_scale is not None:
        tokens = tokens[: tokens.shape[0] // 2]
    if not decode_image:
        return None, tokens
    imgs = vq_decode_code(params["vq"], tokens, model.vq_cfg)
    return imgs, tokens


def mmu_generate(
    params: Dict,
    model: OmniMambaModel,
    input_ids: jax.Array,  # (B, T0) prompt ids: [<|mmu|><|soi|><|eoi|><|sot|>]+text
    image_features: jax.Array,  # (B, 729, d_model) projected patches
    *,
    max_length: int = 2048,
    sample: SampleParams = SampleParams(top_k=1),
    eos_token_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
    scan_impl: str = "auto",
    cache_dtype="auto",
    draft_params: Optional[Dict] = None,
    draft_layers: Optional[int] = None,
    draft_mode: str = "model",  # model | ngram (ngram needs no draft)
    k_draft: int = 8,
    text_lengths: Optional[jax.Array] = None,  # (B,) ragged true text lens
) -> GenerateOutput:
    """Visual question answering decode (reference scripts/inference_mmu.py:
    embeds = [2 specials | 729 image | rest of text], then generate(task=mmu)).

    ``input_ids`` covers only the text tokens; image feature positions are
    accounted for in the position ids automatically via splicing.

    ``draft_params``/``draft_layers`` switch to speculative greedy decoding
    (models/speculative.py) for single-stream (B=1, top_k=1) latency — the
    token stream is identical to the plain path; only speed changes.

    ``text_lengths`` (B,): ragged batching — input_ids right-padded, row
    i's true text is its first text_lengths[i] tokens (incl. the 4 leading
    specials). Each row's stream is exactly its B=1 stream
    (generation.generate prompt_lengths semantics).
    """
    text_emb = embed_text(params["mamba"], input_ids, dtype)
    emb = jnp.concatenate(
        [text_emb[:, :2], image_features.astype(dtype), text_emb[:, 2:]], axis=1
    )
    # ids buffer for the spliced region: fill with pad-like zeros; generation
    # only uses its length (the reference also concatenates ids and embeds of
    # different lengths, inference_mmu.py:76-94)
    B = input_ids.shape[0]
    splice_ids = jnp.zeros((B, emb.shape[1]), jnp.int32)
    splice_ids = splice_ids.at[:, :2].set(input_ids[:, :2])
    splice_ids = splice_ids.at[:, 2 + image_features.shape[1] :].set(input_ids[:, 2:])
    if draft_params is not None or draft_layers is not None or draft_mode != "model":
        from omnimamba_tpu.models.speculative import speculative_generate

        assert sample.top_k == 1, "speculative decode is greedy-only"
        assert text_lengths is None, (
            "speculative decode does not support ragged text_lengths — "
            "right-padded prompts would decode with pads as real context; "
            "use the plain path for ragged batches"
        )
        assert key is None, "speculative decode is deterministic (greedy); key unused"
        dp = draft_params["mamba"] if (
            draft_params is not None and "mamba" in draft_params
        ) else draft_params
        return speculative_generate(
            params["mamba"],
            model.cfg,
            input_ids=splice_ids,
            input_embeddings=emb,
            task="mmu",
            max_length=max_length,
            draft_params=dp,
            draft_layers=draft_layers,
            draft_mode=draft_mode,
            k_draft=k_draft,
            eos_token_id=eos_token_id,
            scan_impl=scan_impl,
            cache_dtype=cache_dtype,
        )
    return generate(
        params["mamba"],
        model.cfg,
        input_ids=splice_ids,
        input_embeddings=emb,
        task="mmu",
        max_length=max_length,
        sample=sample,
        eos_token_id=eos_token_id,
        key=key,
        scan_impl=scan_impl,
        cache_dtype=cache_dtype,
        prompt_lengths=(
            None if text_lengths is None
            else jnp.asarray(text_lengths, jnp.int32) + image_features.shape[1]
        ),
    )
