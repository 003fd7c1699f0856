"""OmniMamba-TPU: a TPU-native (JAX/XLA/Pallas) unified multimodal
understanding + text-to-image generation framework with the capabilities of
hustvl/OmniMamba, re-designed TPU-first.

Layer map (bottom-up, cf. SURVEY.md §1):
  ops/       SSD scan kernels (eager oracle / chunked XLA / Pallas), causal
             conv, norms, samplers
  models/    Mamba-2 mixer, blocks, dual-task LoRA, backbone + dual heads,
             decode engine, VQ-16 tokenizer, DinoSigLIP ViTs, projectors,
             the OmniMamba composition
  data/      tokenizer, universal prompting, conversation templates, datasets
  parallel/  device mesh + sharding rules (dp/fsdp/tp over ICI)
  train/     optax optimizer/schedule, dual-task train step, trainer loop
  utils/     orbax checkpointing, torch->pytree weight converters, logging
"""

__version__ = "0.1.0"

from omnimamba_tpu.config import (  # noqa: F401
    LoraConfig,
    Mamba2LayerConfig,
    MambaConfig,
    MODEL_REGISTRY,
    SpecialTokens,
    TrainConfig,
    ViTConfig,
    VisionConfig,
    VQConfig,
    VQ_MODELS,
)


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    lazy = {
        "build_model": ("omnimamba_tpu.factory", "build_model"),
        "OmniMambaModel": ("omnimamba_tpu.models.omnimamba", "OmniMambaModel"),
        "init_omnimamba": ("omnimamba_tpu.models.omnimamba", "init_omnimamba"),
        "t2i_generate": ("omnimamba_tpu.models.omnimamba", "t2i_generate"),
        "mmu_generate": ("omnimamba_tpu.models.omnimamba", "mmu_generate"),
        "t2i_loss": ("omnimamba_tpu.models.omnimamba", "t2i_loss"),
        "mmu_loss": ("omnimamba_tpu.models.omnimamba", "mmu_loss"),
        "generate": ("omnimamba_tpu.models.generation", "generate"),
        "SampleParams": ("omnimamba_tpu.ops.sampling", "SampleParams"),
        "Trainer": ("omnimamba_tpu.train.trainer", "Trainer"),
        "create_mesh": ("omnimamba_tpu.parallel.mesh", "create_mesh"),
        "shard_params": ("omnimamba_tpu.parallel.sharding", "shard_params"),
        "quantize_decode_params": ("omnimamba_tpu.ops.quant", "quantize_decode_params"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
