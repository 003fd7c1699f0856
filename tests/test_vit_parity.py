"""ViT numerics parity vs torch-recorded activations (VERDICT round-1 item 6).

scripts/gen_vit_fixtures.py implements the timm VisionTransformer graph
independently in torch (the reference's featurizer family,
dinosiglip_vit.py:43-53), seeds random weights, and records
second-to-last-block patch features (base_vision.py:138-143 contract).
Generated deterministically in-memory here (torch is available in CI). The
JAX ViT must reproduce the features through convert_timm_vit to <=1e-4 in
fp32 — numerics-level validation the round-1 structure tests lacked.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import ViTConfig
from omnimamba_tpu.models.vit import vit_features
from omnimamba_tpu.utils.convert import convert_timm_vit

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

CFGS = {
    "dino": ViTConfig(
        img_size=56, patch_size=14, width=64, depth=4, num_heads=4,
        num_reg_tokens=4, use_cls_token=True, layerscale=True,
    ),
    "siglip": ViTConfig(
        img_size=56, patch_size=14, width=64, depth=4, num_heads=4,
        num_reg_tokens=0, use_cls_token=False, layerscale=False,
    ),
}


@pytest.fixture(scope="module")
def fixture():
    from gen_vit_fixtures import generate_fixture

    return generate_fixture()


@pytest.mark.parametrize("name", ["dino", "siglip"])
def test_vit_matches_torch_fixture(fixture, name):
    cfg = CFGS[name]
    prefix = f"{name}_sd/"
    sd = {
        k[len(prefix):]: fixture[k] for k in fixture if k.startswith(prefix)
    }
    params = convert_timm_vit(sd, cfg)
    pixels = jnp.asarray(fixture["pixels_nhwc"])
    feats = jax.jit(
        lambda p, x: vit_features(p, x, cfg), static_argnums=()
    )(jax.tree.map(jnp.asarray, params), pixels)
    want = fixture[f"{name}_features"]
    got = np.asarray(feats)
    assert got.shape == want.shape
    err = np.max(np.abs(got - want)) / max(np.abs(want).max(), 1e-6)
    assert err <= 1e-4, f"{name}: rel err {err:.2e}"


def test_fixture_has_nontrivial_activations(fixture):
    # guard against a degenerate fixture (all zeros would pass parity)
    for name in ("dino", "siglip"):
        assert fixture[f"{name}_features"].std() > 0.1
