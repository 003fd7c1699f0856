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


def test_mixed_step_per_flow_remat_matches_no_remat():
    """Mixed stage-2 steps resolve remat PER FLOW (t2i keeps its
    shape-resolved proj policy, mmu full remat). Like every remat policy
    this must be a memory/time knob only — one optimizer step with
    remat='proj' (auto) must produce the same metrics and params as
    remat=False on a tiny mixed batch."""
    import numpy as onp

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.models.omnimamba import init_omnimamba
    from omnimamba_tpu.train.trainer import create_train_state, make_train_step
    from tests.test_omnimamba import tiny_model
    from tests.test_parallel_train import _batch

    model = tiny_model()
    batch = jax.tree.map(jnp.asarray, _batch(model, B_t2i=2, B_mmu=2))
    key = jax.random.PRNGKey(3)

    results = {}
    for remat in (False, "proj"):
        cfg = TrainConfig(max_steps=10, warmup_steps=0, lr=1e-3, remat=remat)
        params = init_omnimamba(jax.random.PRNGKey(0), model)
        state, tx = create_train_state(params, cfg, stage="finetune")
        step_fn = make_train_step(model, tx, cfg, dtype=jnp.float32, donate=False)
        state2, metrics = step_fn(state, batch, key)
        results[remat] = (state2.params, metrics)

    p0, m0 = results[False]
    p1, m1 = results["proj"]
    for k in ("loss", "loss_t2i", "loss_mmu", "grad_norm"):
        onp.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        onp.testing.assert_allclose(
            onp.asarray(b), onp.asarray(a), rtol=1e-5, atol=1e-6
        )
