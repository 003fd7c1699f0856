"""Trainer-level integration: loop, metrics, checkpoint save/restore-resume,
evaluate, combined-loader cycling, transforms, conversation strings."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import TrainConfig
from omnimamba_tpu.data.loader import CombinedLoader, DataLoader
from omnimamba_tpu.models.omnimamba import init_omnimamba
from omnimamba_tpu.train.trainer import MetricsWriter, Trainer
from omnimamba_tpu.utils.checkpoint import CheckpointManager
from tests.test_omnimamba import tiny_model
from tests.test_parallel_train import _batch


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_trainer_train_eval_checkpoint(tmp_path):
    model = tiny_model()
    cfg = TrainConfig(
        max_steps=3, warmup_steps=0, lr=1e-3, logging_steps=1, save_steps=2,
        scan_impl="chunked",
    )
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    raw = _batch(model)
    loader = _ListLoader([raw] * 4)
    eval_loader = _ListLoader(
        [{"inputs": raw["t2i_flow"]["inputs"], "caption_ids": raw["t2i_flow"]["caption_ids"]}]
    )
    ckpt = CheckpointManager(str(tmp_path / "ck"), save_total_limit=2)
    mw = MetricsWriter(str(tmp_path / "m.jsonl"))
    logs = []
    tr = Trainer(
        model, params, cfg, loader,
        dtype=jnp.float32, checkpoint_manager=ckpt,
        metrics_writer=mw, eval_loader=eval_loader, log_fn=logs.append,
    )
    state, metrics = tr.train()
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))
    # evaluate() runs
    m = tr.evaluate()
    assert "eval_loss" in m and np.isfinite(m["eval_loss"])
    # metrics jsonl written
    mw.close()
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert rows and "loss" in rows[0]
    # checkpoint written at step 2 and restorable
    ckpt._mgr.wait_until_finished()
    assert ckpt.latest_step() == 2
    restored = ckpt.restore(jax.tree.map(jnp.zeros_like, tr.state))
    assert int(restored.step) == 2
    ckpt.close()


def test_combined_loader_max_size_cycle():
    import numpy as np

    class DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    big = DataLoader(DS(8), 2, collate_fn=lambda x: np.asarray(x), shuffle=False)
    small = DataLoader(DS(4), 2, collate_fn=lambda x: np.asarray(x), shuffle=False)
    combined = CombinedLoader({"a": big, "b": small})
    assert len(combined) == 4  # follows the longest (trainer.py:108)
    batches = list(combined)
    assert len(batches) == 4
    # small loader cycled: first batch of b reappears in the 3rd step
    np.testing.assert_array_equal(batches[2]["b"], batches[0]["b"])


def test_transforms_shapes_and_range():
    from omnimamba_tpu.config import ViTConfig
    from omnimamba_tpu.data.transforms import (
        from_vq_range,
        to_vq_range,
        vit_transform,
    )

    raw = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 50, 70, 3)), jnp.uint8)
    cfg = ViTConfig(img_size=28, patch_size=14, width=16, depth=1, num_heads=2)
    out = vit_transform(raw, cfg)
    assert out.shape == (2, 28, 28, 3)
    # normalized: roughly centered
    assert abs(float(out.mean())) < 3

    v = to_vq_range(raw)
    assert -1.0 <= float(v.min()) and float(v.max()) <= 1.0
    back = from_vq_range(v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(raw), atol=1)


def test_phi15_conversation_prompt():
    from omnimamba_tpu.data.conversation import conv_templates

    conv = conv_templates["phi1.5"].copy()
    conv.append_message(conv.roles[0], "What is in this image?")
    conv.append_message(conv.roles[1], None)
    # TWO style, empty system, sep " ": " USER: {q} ASSISTANT:"
    assert conv.get_prompt() == " USER: What is in this image? ASSISTANT:"
    conv2 = conv_templates["phi1.5"].copy()
    conv2.append_message(conv2.roles[0], "hi")
    conv2.append_message(conv2.roles[1], "hello")
    assert conv2.get_prompt() == " USER: hi ASSISTANT: hello<|endoftext|>"


def test_grad_accum_matches_large_batch():
    """cfg.grad_accum=A with the batch split into A micro-batches must
    produce (numerically) the same optimizer step as one step over the
    concatenated batch: per-micro losses are equal-size means, so their
    average equals the large-batch mean, and so do the gradients.
    LoRA dropout is disabled so both paths see identical stochasticity."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.models.omnimamba import init_omnimamba
    from omnimamba_tpu.train.trainer import create_train_state, make_train_step
    from tests.test_omnimamba import tiny_model

    model = tiny_model()
    model = model._replace(
        cfg=dataclasses.replace(
            model.cfg, lora=dataclasses.replace(model.cfg.lora, dropout=0.0)
        )
    )
    rng = np.random.default_rng(0)
    big = {
        "t2i_flow": {
            "inputs": rng.integers(0, 32, (4, model.cfg.num_tokens)),
            "caption_ids": rng.integers(0, 49, (4, 9)),
        }
    }
    stacked = jax.tree.map(lambda x: jnp.asarray(x.reshape(2, 2, *x.shape[1:])), big)
    big = jax.tree.map(jnp.asarray, big)
    key = jax.random.PRNGKey(7)

    results = {}
    for accum, batch in ((1, big), (2, stacked)):
        cfg = TrainConfig(
            max_steps=5, warmup_steps=0, lr=1e-3, mmu_task=False,
            grad_accum=accum,
        )
        params = init_omnimamba(jax.random.PRNGKey(0), model, with_vq=False)
        state, tx = create_train_state(params, cfg)
        step_fn = make_train_step(model, tx, cfg, dtype=jnp.float32, donate=False)
        state2, metrics = step_fn(state, batch, key)
        results[accum] = (state2.params, metrics)

    p1, m1 = results[1]
    p2, m2 = results[2]
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m2["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_accumulate_batches_stacks_and_drops_partial():
    import numpy as np

    from omnimamba_tpu.train.trainer import accumulate_batches

    batches = [{"a": np.full((2, 3), i)} for i in range(5)]
    out = list(accumulate_batches(iter(batches), 2))
    assert len(out) == 2  # trailing partial group dropped
    assert out[0]["a"].shape == (2, 2, 3)
    assert (out[0]["a"][1] == 1).all() and (out[1]["a"][0] == 2).all()
    # accum=1 is a passthrough
    assert len(list(accumulate_batches(iter(batches), 1))) == 5


def test_trainer_periodic_eval(tmp_path):
    """cfg.eval_steps=2 runs evaluate() inside the loop (reference:
    evaluation_strategy='steps') — eval metrics appear in the log stream
    at steps 2 and 4 only."""
    model = tiny_model()
    cfg = TrainConfig(
        max_steps=4, warmup_steps=0, lr=1e-3, logging_steps=100,
        scan_impl="chunked", eval_steps=2,
    )
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    raw = _batch(model)
    loader = _ListLoader([raw] * 4)
    eval_loader = _ListLoader(
        [{"inputs": raw["t2i_flow"]["inputs"],
          "caption_ids": raw["t2i_flow"]["caption_ids"]}]
    )
    logs = []
    tr = Trainer(
        model, params, cfg, loader,
        dtype=jnp.float32, eval_loader=eval_loader, log_fn=logs.append,
    )
    tr.train()
    evals = [l for l in logs if "eval_t2i_loss" in str(l)]
    assert len(evals) == 2


def test_accumulate_batches_raises_on_starved_epoch():
    """grad_accum larger than the epoch would yield nothing and spin the
    train loop forever — must raise instead."""
    import numpy as np

    from omnimamba_tpu.train.trainer import accumulate_batches

    batches = [{"a": np.zeros((2, 3))}] * 3
    with pytest.raises(ValueError, match="grad_accum"):
        list(accumulate_batches(iter(batches), 4))
