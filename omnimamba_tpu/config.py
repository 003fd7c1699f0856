"""Typed configuration for the OmniMamba-TPU framework.

These dataclasses mirror the behavioural surface of the reference
(hustvl/OmniMamba):

- ``MambaConfig``        <- reference ``models/stage2/config_mamba.py:4-39``
- ``Mamba2LayerConfig``  <- hyperparameters of ``mamba_ssm.modules.mamba2.Mamba2``
  (external dependency of the reference, pinned at mamba_ssm==2.2.2)
- ``VQConfig``           <- reference ``llamagen_tokenizer/tokenizer_image/vq_model.py:12-24``
- ``VisionConfig``       <- reference ``models/cobra/backbones/vision/dinosiglip_vit.py:20-25``
- ``LoraConfig``         <- reference ``models/stage2/lora.py:80-96``
- ``TrainConfig``        <- reference ``config/*.yaml`` + ``train_stage2.py:51-66``

Everything downstream (parameter shapes, sequence layouts, vocab padding) is
derived from these configs, so fidelity tests can be written purely in terms
of them.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class Mamba2LayerConfig:
    """Per-layer Mamba-2 mixer hyperparameters.

    Defaults equal mamba_ssm 2.2.2's ``Mamba2.__init__`` defaults, which is
    what the reference instantiates via ``ssm_cfg={'layer': 'Mamba2'}``
    (reference ``models/stage2/config_mamba.py:16``,
    ``models/stage2/mixer_seq_simple.py:196-205``).
    """

    d_model: int = 2048
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    # backward-kernel head tile override (None = kernel default: largest
    # divisor of nheads/ngroups <= 64). Larger tiles amortize the shared
    # score matmuls + the batched suffix-sum dot over more heads per grid
    # step; on v5e at the 1.3B shape ht=64 beats ht=16 by ~40% bwd-only
    # (scripts/profile_train.py ssd sweep, round 3).
    bwd_head_tile: Optional[int] = None
    norm_eps: float = 1e-5
    conv_bias: bool = True
    proj_bias: bool = False
    # A init range (uniform in [1, 16], stored as log)
    a_init_min: float = 1.0
    a_init_max: float = 16.0
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    dt_limit: Tuple[float, float] = (0.0, float("inf"))

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def nheads(self) -> int:
        assert self.d_inner % self.headdim == 0
        return self.d_inner // self.headdim

    @property
    def d_conv_in(self) -> int:
        """Channels entering the depthwise causal conv: x ++ B ++ C."""
        return self.d_inner + 2 * self.ngroups * self.d_state

    @property
    def d_in_proj(self) -> int:
        """Output width of in_proj: [z, x, B, C, dt]."""
        return 2 * self.d_inner + 2 * self.ngroups * self.d_state + self.nheads


@dataclass(frozen=True)
class LoraConfig:
    """Dual-task LoRA on every mixer's in_proj.

    Reference: ``models/stage2/lora.py:80-96`` (r=8, alpha=32, dropout=0.05,
    lora_nums=1) applied to target module ``in_proj`` only (``lora.py:90``).
    """

    r: int = 8
    alpha: int = 32
    dropout: float = 0.05
    lora_nums: int = 1

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


@dataclass(frozen=True)
class MambaConfig:
    """Backbone config. Mirrors reference ``models/stage2/config_mamba.py``."""

    d_model: int = 2048
    d_intermediate: int = 0
    n_layer: int = 48

    # llamagen_t2i image-token vocabulary
    vqvae_vocab_size: int = 16384
    num_tokens: int = 256  # 16x16 grid at f16 on 256px images

    vocab_size: int = 50277
    pad_vocab_size_multiple: int = 16

    rms_norm: bool = True
    residual_in_fp32: bool = True
    norm_eps: float = 1e-5
    tie_embeddings: bool = True

    # dormant options kept for config-surface parity
    # (attn_layer_idx/attn_cfg, config_mamba.py:17-18; d_intermediate=0 above)
    attn_layer_idx: Tuple[int, ...] = ()
    attn_num_heads: int = 16
    attn_rotary_dim: int = 0

    # task switches (gate construction of img/text extras,
    # reference config_mamba.py:38-39)
    t2i_task: bool = True
    mmu_task: bool = True

    # sequence-layout constants
    # pos table covers 72 caption slots + 256 image tokens + 1
    # (reference mixer_seq_simple.py:298-299: num_tokens + 73)
    mmu_pos_len: int = 1500  # reference mixer_seq_simple.py:301-303
    img_sq_len: int = 729  # dino+siglip patch count, mixer_seq_simple.py:305

    mixer: Mamba2LayerConfig = field(default_factory=Mamba2LayerConfig)
    lora: LoraConfig = field(default_factory=LoraConfig)

    # dropout knobs (all 0 in shipped configs)
    token_drop: float = 0.0
    mixer_drop: float = 0.0
    mlp_drop: float = 0.0

    @property
    def padded_vocab_size(self) -> int:
        """Text vocab padded to a multiple (reference mixer_seq_simple.py:459-461)."""
        return _round_up(self.vocab_size, self.pad_vocab_size_multiple)

    @property
    def t2i_pos_len(self) -> int:
        return self.num_tokens + 73

    def with_mixer(self, **kw) -> "MambaConfig":
        return dataclasses.replace(self, mixer=dataclasses.replace(self.mixer, **kw))

    def resized(self, new_vocab: int) -> "MambaConfig":
        """Vocab resize, mirroring resize_token_embeddings semantics
        (reference mixer_seq_simple.py:559-678 + mamba_vlm.py:72-73):
        tokenizer grows by [PAD] + 9 specials then pads to multiple of 16."""
        return dataclasses.replace(self, vocab_size=_round_up(new_vocab, self.pad_vocab_size_multiple))


def omnimamba_l(**kw) -> MambaConfig:
    """OmniMamba-L: d_model=1024 (reference mamba_vlm.py:112-113)."""
    base = MambaConfig(d_model=1024, **kw)
    return base.with_mixer(d_model=1024)


def omnimamba_1_3b(**kw) -> MambaConfig:
    """OmniMamba-1.3B: d_model=2048 (reference mamba_vlm.py:115-116)."""
    base = MambaConfig(d_model=2048, **kw)
    return base.with_mixer(d_model=2048)


def omnimamba_tiny(**kw) -> MambaConfig:
    """Tiny debug/smoke model (no reference analog): full architecture at
    toy width so CLIs and CI can run end-to-end on CPU."""
    mixer = Mamba2LayerConfig(d_model=128, d_state=32, headdim=16, chunk_size=32)
    base = MambaConfig(d_model=128, n_layer=4, mmu_pos_len=1500, mixer=mixer, **kw)
    return base


MODEL_REGISTRY = {
    "OmniMamba-L": omnimamba_l,
    "OmniMamba-1.3B": omnimamba_1_3b,
    "OmniMamba-Tiny": omnimamba_tiny,
}


@dataclass(frozen=True)
class VQConfig:
    """LlamaGen VQ-16 tokenizer config.

    Reference: ``llamagen_tokenizer/tokenizer_image/vq_model.py:12-24,418-424``.
    """

    codebook_size: int = 16384
    codebook_embed_dim: int = 8
    codebook_l2_norm: bool = True
    commit_loss_beta: float = 0.25
    entropy_loss_ratio: float = 0.0
    ch: int = 128
    num_res_blocks: int = 2
    encoder_ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    decoder_ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    z_channels: int = 256
    dropout_p: float = 0.0

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.encoder_ch_mult) - 1)


def vq_16() -> VQConfig:
    return VQConfig()


def vq_8() -> VQConfig:
    return VQConfig(encoder_ch_mult=(1, 2, 2, 4), decoder_ch_mult=(1, 2, 2, 4))


VQ_MODELS = {"VQ-16": vq_16, "VQ-8": vq_8}


@dataclass(frozen=True)
class ViTConfig:
    """A single ViT featurizer (timm-compatible geometry)."""

    img_size: int = 384
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_reg_tokens: int = 0  # DINOv2 "reg4" uses 4
    use_cls_token: bool = True
    use_swiglu: bool = False  # DINOv2-L uses plain MLP; giant uses swiglu
    layerscale: bool = False  # DINOv2 uses LayerScale
    norm_eps: float = 1e-6
    # data preprocessing
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    interpolation: str = "bicubic"
    # timm eval-transform crop fraction; scale_size = floor(img_size/crop_pct).
    # 1.0 for both shipped featurizers: DINOv2 has crop_pct=1.0 and the
    # reference pins SigLIP's resize to the target size
    # (dinosiglip_vit.py:77-84).
    crop_pct: float = 1.0

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


def dinov2_l_reg4_384() -> ViTConfig:
    """vit_large_patch14_reg4_dinov2.lvd142m at 384px (729 patches).

    Reference: ``models/cobra/backbones/vision/dinosiglip_vit.py:22`` with
    img_size overridden to 384 (``dinosiglip_vit.py:43-52``).
    """
    return ViTConfig(
        img_size=384, patch_size=14, width=1024, depth=24, num_heads=16,
        num_reg_tokens=4, use_cls_token=True, layerscale=True,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
    )


def siglip_so400m_384() -> ViTConfig:
    """vit_so400m_patch14_siglip_384 (729 patches, no cls token).

    Reference: ``dinosiglip_vit.py:23``.
    """
    return ViTConfig(
        img_size=384, patch_size=14, width=1152, depth=27, num_heads=16,
        mlp_ratio=3.7362,  # so400m: mlp hidden 4304
        num_reg_tokens=0, use_cls_token=False, layerscale=False,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    )


@dataclass(frozen=True)
class VisionConfig:
    """DinoSigLIP fused backbone (reference ``dinosiglip_vit.py:37-160``)."""

    dino: ViTConfig = field(default_factory=dinov2_l_reg4_384)
    siglip: ViTConfig = field(default_factory=siglip_so400m_384)
    resize_strategy: str = "resize-naive"

    @property
    def embed_dim(self) -> int:
        """Concatenated feature dim: 1024 + 1152 = 2176."""
        return self.dino.width + self.siglip.width

    @property
    def num_patches(self) -> int:
        assert self.dino.num_patches == self.siglip.num_patches
        return self.dino.num_patches


def _dinosiglip_tiny() -> VisionConfig:
    """Toy dual backbone for CPU smoke runs (no reference analog)."""
    return VisionConfig(
        dino=ViTConfig(
            img_size=56, patch_size=14, width=64, depth=2, num_heads=2,
            num_reg_tokens=4, layerscale=True,
        ),
        siglip=ViTConfig(
            img_size=56, patch_size=14, width=64, depth=2, num_heads=2,
            use_cls_token=False,
        ),
    )


def clip_vit_l_336() -> ViTConfig:
    """clip-vit-l-336px (clip_vit.py registry entry): quick-gelu CLIP-L/14."""
    return ViTConfig(
        img_size=336, patch_size=14, width=1024, depth=24, num_heads=16,
        num_reg_tokens=0, use_cls_token=True, layerscale=False,
        mean=(0.4815, 0.4578, 0.4082), std=(0.2686, 0.2613, 0.2758),
    )


def in1k_vit_l() -> ViTConfig:
    """in1k-vit-l (in1k_vit.py): ViT-L/16 @224 supervised."""
    return ViTConfig(
        img_size=224, patch_size=16, width=1024, depth=24, num_heads=16,
        num_reg_tokens=0, use_cls_token=True, layerscale=False,
    )


def _dinoclip_336() -> VisionConfig:
    """dinoclip-vit-l-336px (dinoclip_vit.py:20-25): DINOv2-L reg4 + CLIP-L
    openai, both at 336px (576 patches per tower). Same dual-tower engine
    as DinoSigLIP; the second slot carries the CLIP geometry."""
    import dataclasses as _dc

    return VisionConfig(
        dino=_dc.replace(dinov2_l_reg4_384(), img_size=336),
        siglip=clip_vit_l_336(),
    )


def _single(name_cfg):
    def make():
        # single-featurizer "fusion": second slot empty width handled by
        # VisionConfig consumers via dino-only concat
        return VisionConfig(dino=name_cfg(), siglip=name_cfg())

    return make


# analog of the reference's VISION_BACKBONES registry
# (models/cobra/materialize.py:26-65 + dinosiglip_vit.py:20-25). The shipped
# model uses only dinosiglip-vit-so-384px; single-tower entries are exposed
# with the same ViT engine for parity with clip/siglip/dinov2/in1k ids.
VISION_BACKBONES = {
    "dinosiglip-vit-so-384px": VisionConfig,
    "dinosiglip-tiny": _dinosiglip_tiny,
    "dinoclip-vit-l-336px": _dinoclip_336,
    "clip-vit-l-336px": _single(clip_vit_l_336),
    "siglip-vit-so400m-384px": _single(siglip_so400m_384),
    "dinov2-vit-l-384px": _single(dinov2_l_reg4_384),
    "in1k-vit-l-224px": _single(in1k_vit_l),
}


@dataclass(frozen=True)
class SpecialTokens:
    """The 10 tokens the reference adds to the GPT-NeoX tokenizer.

    Reference: ``models/mamba_vlm.py:32-37`` + ``prompting_utils.py:26-32``:
    ``[PAD]`` is added as pad token first, then the 9 specials, so with a base
    vocab of 50277 the ids are 50277..50286.
    """

    order: Tuple[str, ...] = (
        "<|soi|>", "<|eoi|>", "<|sot|>", "<|eot|>", "<|t2i|>",
        "<|mmu|>", "<|soc|>", "<|eoc|>", "<|lvg|>",
    )
    pad_token: str = "[PAD]"


@dataclass
class TrainConfig:
    """Mirrors the YAML ``train:`` block + argparse defaults.

    Reference: ``config/config_stage2.yaml``, ``train_stage2.py:51-66``.
    """

    omnimamba_model: str = "OmniMamba-1.3B"
    image_backbone: str = "dinosiglip-vit-so-384px"
    dataset: str = "datasets/pretokenized_coco_train2014.jsonl"
    stage: str = "finetune"  # align | finetune | inference
    vq_ckpt: Optional[str] = None
    t2i_task: bool = True
    mmu_task: bool = True
    omnimamba_ckpt: Optional[str] = None
    mamba_pretrain: Optional[str] = None
    batch_size_t2i: int = 48
    batch_size_mmu: int = 3
    lr: float = 1e-4
    max_steps: int = 150000
    warmup_steps: int = 0
    resume_dir: Optional[str] = None
    output_dir: str = "logs/"
    logging_steps: int = 500
    bf16: bool = True
    # optimizer (train_stage2.py argparse defaults)
    decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.95
    grad_accum: int = 1
    min_lr_rate: float = 0.01
    scheduler: str = "cosine_with_min_lr"
    save_steps: int = 5000
    save_total_limit: int = 5
    # evaluate() every N optimizer steps when an eval loader is configured
    # (reference: HF evaluation_strategy="steps", train_stage2.py:36);
    # 0 disables
    eval_steps: int = 0
    seed: int = 0
    num_workers: int = 16
    # TPU-native additions (no reference analog; DP-only there, SURVEY §2.4)
    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"dp": 1, "tp": 1})
    # SSD kernel for the training forward/backward:
    #   auto -> fused Pallas custom-VJP on TPU, chunked-XLA elsewhere
    scan_impl: str = "auto"
    # gradient checkpointing over the 48-block scan (trades ~30% step time
    # for O(1)-in-depth activation memory). True = full remat;
    # "proj" = additionally keep each block's in_proj outputs (~2.1 GB at
    # 1.3B B=8) so the backward skips the dominant matmul recompute;
    # "dots" = keep every matmul output (OOMs at 1.3B B=8 on one chip)
    remat: Any = "proj"
    # mmu-flow override for mixed (stage-2) steps: the t2i flow resolves
    # cfg.remat normally; the mmu flow (long spliced rows + frozen vision
    # towers) uses this. None = resolve automatically (full remat unless
    # measured otherwise); set e.g. "proj_xbd" to experiment.
    remat_mmu: Any = None

    @classmethod
    def from_yaml(cls, path: str) -> "TrainConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f)["train"]
        raw["lr"] = float(raw["lr"])
        known = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in raw.items() if k in known})
        if not cfg.t2i_task:
            cfg.batch_size_t2i = 0
        if not cfg.mmu_task:
            cfg.batch_size_mmu = 0
        return cfg
