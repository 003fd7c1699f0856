"""BASELINE.json gate configs, consolidated (tiny geometry, full code paths).

1. VQ encode->decode roundtrip on mmu_validation/cat_dog.png
2. MMU captioning greedy decode (inference_mmu path)
3. T2I 16x16-grid generation with CFG-capable sampler (inference_t2i path)
4. Stage-1 T2I training step (align stage, bf16-able)
5. Stage-2 unified MMU+T2I step with task LoRA + decoupled vocab heads
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import TrainConfig
from omnimamba_tpu.models.omnimamba import (
    init_omnimamba,
    mmu_generate,
    mmu_image_features,
    t2i_generate,
)
from omnimamba_tpu.ops.sampling import SampleParams
from omnimamba_tpu.train.trainer import create_train_state, make_train_step
from tests.test_omnimamba import tiny_model
from tests.test_parallel_train import _batch

CAT_DOG = "/root/reference/mmu_validation/cat_dog.png"


@pytest.fixture(scope="module")
def omni():
    model = tiny_model()
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    return model, params


def test_gate1_vq_roundtrip_cat_dog(omni):
    from PIL import Image

    from omnimamba_tpu.models import vq as vq_mod

    model, params = omni
    img = Image.open(CAT_DOG).convert("RGB").resize((32, 32))
    x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    out = jax.jit(lambda p, x: vq_mod.vq_encode(p, x, model.vq_cfg), static_argnums=())(
        params["vq"], x
    )
    rec = jax.jit(lambda p, q: vq_mod.vq_decode(p, q, model.vq_cfg))(
        params["vq"], out.quant
    )
    assert rec.shape == x.shape and bool(jnp.isfinite(rec).all())


def test_gate2_mmu_greedy_caption(omni):
    from PIL import Image

    from omnimamba_tpu.data.transforms import vit_transform

    model, params = omni
    img = Image.open(CAT_DOG).convert("RGB")
    raw = jnp.asarray(np.asarray(img, np.uint8))[None]
    pix = {
        "dino": vit_transform(raw, model.vision_cfg.dino),
        "siglip": vit_transform(raw, model.vision_cfg.siglip),
    }
    feats = mmu_image_features(params, model, pix)
    sp = model.sptids
    prompt = jnp.asarray(
        [[sp["<|mmu|>"], sp["<|soi|>"], sp["<|eoi|>"], sp["<|sot|>"], 11, 12, 13]],
        jnp.int32,
    )
    out = mmu_generate(
        params, model, prompt, feats, max_length=24,
        sample=SampleParams(top_k=1), eos_token_id=0, dtype=jnp.float32,
    )
    assert out.sequences.shape[1] == 24


def test_gate3_t2i_cfg_generation(omni):
    model, params = omni
    cond = jnp.asarray(np.arange(6)[None], jnp.int32)
    uncond = jnp.full((1, 6), 3, jnp.int32)
    packed = jnp.concatenate([cond, uncond], 0)
    imgs, tokens = t2i_generate(
        params, model, packed, sample=SampleParams(top_k=1),
        cfg_scale=5.0, dtype=jnp.float32,
    )
    assert tokens.shape == (1, model.cfg.num_tokens)
    assert imgs.shape[0] == 1 and bool(jnp.isfinite(imgs).all())


def test_gate4_stage1_t2i_step(omni):
    model, params = omni
    cfg = TrainConfig(
        max_steps=2, warmup_steps=0, lr=8e-4, stage="align",
        t2i_task=True, mmu_task=False,
    )
    state, tx = create_train_state(params, cfg, stage="align")
    step_fn = make_train_step(model, tx, cfg, dtype=jnp.float32, donate=False)
    batch = {"t2i_flow": jax.tree.map(jnp.asarray, _batch(model)["t2i_flow"])}
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_t2i"])) and float(metrics["loss_mmu"]) == 0
    # align stage: mixer core frozen, img embeddings train
    d_core = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["mamba"]["layers"]["mixer"]["in_proj"],
        state.params["mamba"]["layers"]["mixer"]["in_proj"],
    )
    assert max(jax.tree.leaves(d_core)) == 0
    d_img = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["mamba"]["img_embeddings"],
        state.params["mamba"]["img_embeddings"],
    )
    assert max(jax.tree.leaves(d_img)) > 0


def test_gate5_stage2_unified_step(omni):
    model, params = omni
    cfg = TrainConfig(max_steps=2, warmup_steps=0, lr=1e-4, stage="finetune")
    state, tx = create_train_state(params, cfg, stage="finetune")
    step_fn = make_train_step(model, tx, cfg, dtype=jnp.float32, donate=False)
    batch = jax.tree.map(jnp.asarray, _batch(model))
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["loss_t2i"]) > 0 and float(metrics["loss_mmu"]) > 0
    # dual-task LoRA moved
    d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state2.params["mamba"]["layers"]["mixer"]["lora"],
        state.params["mamba"]["layers"]["mixer"]["lora"],
    )
    assert max(jax.tree.leaves(d)) > 0


def test_tp_sharded_generation():
    """Decode under a tp=4 mesh — TP serving path compiles and runs."""
    from jax.sharding import Mesh

    from omnimamba_tpu.models.backbone import embed_text
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.parallel.mesh import create_mesh
    from omnimamba_tpu.parallel.sharding import shard_params

    model = tiny_model()
    params = {"mamba": jax.tree.map(jnp.asarray, init_omnimamba(
        jax.random.PRNGKey(0), model, with_vision=False, with_vq=False
    )["mamba"])}
    mesh = create_mesh({"dp": 2, "tp": 4})
    params = shard_params(mesh, params)
    ids = jnp.arange(5, dtype=jnp.int32)[None]
    emb = embed_text(params["mamba"], ids, jnp.float32)
    out = generate(
        params["mamba"], model.cfg, input_ids=ids, input_embeddings=emb,
        task="mmu", max_length=12, sample=SampleParams(top_k=1),
        scan_impl="chunked",
    )
    assert out.sequences.shape == (1, 12)
