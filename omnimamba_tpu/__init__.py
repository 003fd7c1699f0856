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
