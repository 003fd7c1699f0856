"""Config parity vs the ACTUAL reference files.

Locks (a) the ``train:`` section of all three stage YAMLs byte-for-value to
``/root/reference/config/*.yaml`` and (b) the shared scalar defaults of
``models/stage2/config_mamba.py:MambaConfig`` to ours, so config drift from
the reference is a test failure rather than a silent divergence.
"""

from __future__ import annotations

import os
import sys

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)

if REF not in sys.path:
    sys.path.insert(0, REF)

yaml = pytest.importorskip("yaml")

STAGES = ["config_stage1_mmu", "config_stage1_t2i", "config_stage2"]


@pytest.mark.parametrize("stage", STAGES)
def test_train_section_matches_reference(stage):
    with open(os.path.join(REF, "config", stage + ".yaml")) as f:
        ref = yaml.safe_load(f)["train"]
    with open(os.path.join("config", stage + ".yaml")) as f:
        mine = yaml.safe_load(f)["train"]
    # ours may ADD keys (TPU-only knobs); every reference key must match
    missing = sorted(set(ref) - set(mine))
    assert not missing, f"train keys missing from config/{stage}.yaml: {missing}"
    diverged = {k: (ref[k], mine[k]) for k in ref if mine[k] != ref[k]}
    assert not diverged, f"train values diverge (ref, mine): {diverged}"


def test_config_mamba_defaults_match():
    from models.stage2.config_mamba import MambaConfig as RefCfg

    from omnimamba_tpu.config import MambaConfig as MyCfg

    ref, mine = RefCfg(), MyCfg()
    # shared scalar fields (ours defaults to the shipped 1.3B d_model=2048,
    # the reference dataclass default is the dormant 1024 — models are always
    # built via the size registry on both sides, so d_model is exempt)
    for f in (
        "d_intermediate", "n_layer", "vqvae_vocab_size", "num_tokens",
        "vocab_size", "pad_vocab_size_multiple", "rms_norm",
        "residual_in_fp32", "tie_embeddings", "token_drop", "mixer_drop",
        "mlp_drop",
    ):
        assert getattr(mine, f) == getattr(ref, f), f
    assert tuple(mine.attn_layer_idx) == tuple(ref.attn_layer_idx)
    # reference ssm_cfg selects the Mamba2 mixer; ours is the Mamba2 layer
    # config dataclass
    assert ref.ssm_cfg == {"layer": "Mamba2"}
    # task gates default False in the reference dataclass but are always set
    # by the YAML (t2i_task/mmu_task True in config_stage2.yaml) — ours
    # defaults them True; both shipped configurations agree, so assert the
    # YAML-resolved values instead of the dataclass defaults
    with open(os.path.join(REF, "config", "config_stage2.yaml")) as f:
        tr = yaml.safe_load(f)["train"]
    assert bool(tr["t2i_task"]) == mine.t2i_task
    assert bool(tr["mmu_task"]) == mine.mmu_task
