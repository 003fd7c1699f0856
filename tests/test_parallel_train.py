"""Multi-chip sharded training: dp x tp mesh on 8 virtual CPU devices.

Validates the full train step (both tasks, LoRA, dual heads, AdamW with
freezing masks) compiles and executes under real shardings — the same path
__graft_entry__.dryrun_multichip exercises for the driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.collective

from omnimamba_tpu.config import TrainConfig
from omnimamba_tpu.models.omnimamba import init_omnimamba
from omnimamba_tpu.parallel.mesh import create_mesh
from omnimamba_tpu.parallel.sharding import shard_params
from omnimamba_tpu.train.optimizer import decay_mask, make_schedule, trainable_mask
from omnimamba_tpu.train.trainer import (
    create_train_state,
    make_train_step,
    shard_batch,
)
from tests.test_omnimamba import tiny_model


def _batch(model, B_t2i=8, B_mmu=8, T=10):
    rng = np.random.default_rng(0)
    return {
        "t2i_flow": {
            "inputs": rng.integers(0, 32, (B_t2i, model.cfg.num_tokens)),
            "caption_ids": rng.integers(0, 49, (B_t2i, 9)),
        },
        "mmu_flow": {
            "pixel_values": {
                "dino": rng.normal(size=(B_mmu, 28, 28, 3)).astype(np.float32),
                "siglip": rng.normal(size=(B_mmu, 28, 28, 3)).astype(np.float32),
            },
            "input_ids": rng.integers(0, 49, (B_mmu, T)),
            "labels": rng.integers(0, 49, (B_mmu, T)),
            "multimodal_mask": np.array([True] * (B_mmu - 2) + [False, False]),
        },
    }


def test_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("mesh_shape", [{"dp": 2, "tp": 4}, {"dp": 8}, {"dp": 2, "fsdp": 2, "tp": 2}])
def test_sharded_train_step(mesh_shape):
    model = tiny_model()
    cfg = TrainConfig(max_steps=10, warmup_steps=0, lr=1e-3, mesh_shape=mesh_shape)
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    mesh = create_mesh(mesh_shape)
    params = shard_params(mesh, params)
    state, tx = create_train_state(params, cfg, stage="finetune")
    step_fn = make_train_step(model, tx, cfg, mesh=mesh, dtype=jnp.float32, donate=False)

    batch = shard_batch(mesh, _batch(model))
    key = jax.random.PRNGKey(1)
    state2, metrics = step_fn(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_t2i"]) > 0 and float(metrics["loss_mmu"]) > 0
    # params actually moved
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state2.params["mamba"], params["mamba"]
    )
    assert max(jax.tree.leaves(delta)) > 0
    # frozen modules did not move
    if "vision" in params:
        dv = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state2.params["vision"], params["vision"],
        )
        assert max(jax.tree.leaves(dv)) == 0


def test_align_stage_freezing():
    model = tiny_model()
    cfg = TrainConfig(max_steps=10, lr=1e-3, stage="align")
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    state, tx = create_train_state(params, cfg, stage="align")
    step_fn = make_train_step(model, tx, cfg, dtype=jnp.float32, donate=False)
    state2, _ = step_fn(state, jax.tree.map(jnp.asarray, _batch(model)), jax.random.PRNGKey(2))

    # LoRA + projector + t2i embedding extras train; mixer core frozen
    lora_delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["mamba"]["layers"]["mixer"]["lora"],
        state.params["mamba"]["layers"]["mixer"]["lora"],
    )
    assert max(jax.tree.leaves(lora_delta)) > 0
    core = ["in_proj", "out_proj", "conv"]
    for k in core:
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state2.params["mamba"]["layers"]["mixer"][k],
            state.params["mamba"]["layers"]["mixer"][k],
        )
        assert max(jax.tree.leaves(d)) == 0, k
    d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["projector"], state.params["projector"],
    )
    assert max(jax.tree.leaves(d)) > 0


def test_schedule_shapes():
    cfg = TrainConfig(lr=1e-4, warmup_steps=100, max_steps=1000, min_lr_rate=0.01)
    sched = make_schedule(cfg)
    assert float(sched(0)) == 0.0 or float(sched(0)) < 1e-4
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), 1e-6, rtol=1e-3)


def test_decay_mask_logical_rank():
    model = tiny_model()
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    m = decay_mask(params)
    # stacked norm weight (L, d) is logically 1-D -> no decay
    assert m["mamba"]["layers"]["norm"]["weight"] is False
    # stacked in_proj kernel (L, d, out) is logically 2-D -> decay
    assert m["mamba"]["layers"]["mixer"]["in_proj"]["z"] is True
    # non-mamba params never decay (trainer.py:152-158 scopes to model.mamba)
    assert all(not v for v in jax.tree.leaves(m.get("projector", {})))


def test_speculative_decode_under_tp_mesh():
    """Continuation prefill + speculative decode under a tp-sharded mesh:
    GSPMD must propagate shardings through the window passes and draft
    steps, and the stream must match the unsharded greedy stream."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.models.speculative import speculative_generate
    from omnimamba_tpu.ops.sampling import SampleParams
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    emb = embed_text(params, ids, jnp.float32)
    ref = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=24, sample=SampleParams(top_k=1),
    )

    mesh = create_mesh({"tp": 2})
    sparams = shard_params(mesh, params)
    rep = NamedSharding(mesh, P())
    out = jax.jit(
        lambda p, i, e: speculative_generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=24, k_draft=4, draft_layers=2,
        )
    )(sparams, jax.device_put(ids, rep), jax.device_put(emb, rep))
    np.testing.assert_array_equal(np.asarray(out.sequences), np.asarray(ref.sequences))


def test_sharded_grad_accum_step():
    """grad_accum=2 under a dp mesh: the stacked (accum, batch, ...) leaves
    shard on axis 1 and the scan-accumulated step runs under GSPMD."""
    model = tiny_model()
    cfg = TrainConfig(max_steps=10, warmup_steps=0, lr=1e-3, grad_accum=2)
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    mesh = create_mesh({"dp": 8})
    params = shard_params(mesh, params)
    state, tx = create_train_state(params, cfg, stage="finetune")
    step_fn = make_train_step(model, tx, cfg, mesh=mesh, dtype=jnp.float32, donate=False)

    single = _batch(model)
    stacked = jax.tree.map(
        lambda a: np.stack([np.asarray(a), np.asarray(a)]), single
    )
    batch = shard_batch(mesh, stacked, stacked=True)
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["mamba"], params["mamba"],
    )
    assert max(jax.tree.leaves(delta)) > 0


def test_int8_state_decode_under_tp_mesh():
    """cache_dtype='int8' (scaled-int8 SSM state dict) under a tp-sharded
    mesh: GSPMD must propagate shardings through the {'q','scale'} carry,
    and the greedy stream must track the unsharded fp32-state stream."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(6), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    emb = embed_text(params, ids, jnp.float32)
    ref = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=20, sample=SampleParams(top_k=1),
    ).sequences

    mesh = create_mesh({"tp": 2})
    sparams = shard_params(mesh, params)
    rep = NamedSharding(mesh, P())
    out = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=20, sample=SampleParams(top_k=1), cache_dtype="int8",
        ).sequences
    )(sparams, jax.device_put(ids, rep), jax.device_put(emb, rep))
    agree = (np.asarray(out) == np.asarray(ref)).mean()
    assert agree > 0.7, float(agree)
