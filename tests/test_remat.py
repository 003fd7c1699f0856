"""Remat policies change memory/time, NEVER math: gradients through
backbone_forward must be identical across remat=False/True/proj/proj_xbd/
dots (fp32, tiny geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.models.backbone import (
    backbone_forward,
    embed_text,
    init_backbone,
)
from tests.test_backbone import tiny_config


@pytest.mark.parametrize("remat", [True, "proj", "proj_xbd", "proj_ssd", "dots"])
def test_remat_policies_match_no_remat_grads(remat):
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    ids = jnp.arange(8, dtype=jnp.int32)[None]

    def loss(p, remat):
        emb = embed_text(p, ids, jnp.float32)
        h, _ = backbone_forward(p, emb, "mmu", cfg, remat=remat)
        return jnp.sum(h * h)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, remat))(params)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("remat", ["proj_xbd", "proj_ssd"])
def test_remat_policies_match_with_pallas_ad(remat):
    """proj_ssd pins the pallas_ad custom-VJP's named residuals (ssd_out /
    ssd_resid / ssd_in) — verify the policy changes nothing numerically on
    the kernel path itself (interpret mode on CPU)."""
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    ids = jnp.arange(8, dtype=jnp.int32)[None]

    def loss(p, remat):
        emb = embed_text(p, ids, jnp.float32)
        h, _ = backbone_forward(
            p, emb, "mmu", cfg, remat=remat, scan_impl="pallas_ad"
        )
        return jnp.sum(h * h)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, remat))(params)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)
