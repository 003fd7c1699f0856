"""Edge cases: VQ training losses, tokenizer decode, conversation styles,
native-reader error paths, mesh validation, dataset fallbacks."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_vq_entropy_loss_path():
    import dataclasses

    from omnimamba_tpu.models import vq as vq_mod
    from tests.test_vq import small_cfg

    cfg = dataclasses.replace(small_cfg(), entropy_loss_ratio=0.1)
    params = vq_mod.init_vq(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3), minval=-1, maxval=1)
    out = jax.jit(lambda p, x: vq_mod.vq_encode(p, x, cfg, training=True))(params, img)
    assert np.isfinite(float(out.entropy_loss))
    assert np.isfinite(float(out.vq_loss)) and np.isfinite(float(out.commit_loss))


def test_offline_tokenizer_roundtrip_and_specials():
    from omnimamba_tpu.data.tokenizer import OfflineTokenizer, add_omnimamba_tokens

    tok = OfflineTokenizer()
    sp = add_omnimamba_tokens(tok)
    ids = tok.encode("hello world <|t2i|>")
    assert ids[-1] == sp["<|t2i|>"]
    # decode skips specials when asked
    text = tok.decode(ids, skip_special_tokens=True)
    assert "<|t2i|>" not in text
    text2 = tok.decode(ids, skip_special_tokens=False)
    assert "<|t2i|>" in text2
    # deterministic word hashing
    assert tok.encode("hello")[0] == tok.encode("hello")[0]
    assert tok.encode("hello")[0] != tok.encode("world")[0]


def test_conversation_single_and_plain_styles():
    from omnimamba_tpu.data.conversation import (
        Conversation,
        SeparatorStyle,
        conv_templates,
    )

    conv = Conversation(
        system="SYS", roles=("A", "B"), messages=[], offset=0,
        sep_style=SeparatorStyle.SINGLE, sep="###",
    )
    conv.append_message("A", "hi")
    conv.append_message("B", None)
    assert conv.get_prompt() == "SYS###A: hi###B:"

    plain = conv_templates["plain"].copy()
    plain.append_message("", "just text")
    assert "just text" in plain.get_prompt()


def test_native_reader_missing_file():
    from omnimamba_tpu.data.native import NativeCocoReader, native_available

    if not native_available():
        pytest.skip("native lib not built")
    with pytest.raises(FileNotFoundError):
        NativeCocoReader("/nonexistent/file.jsonl")


def test_native_reader_bad_row(tmp_path):
    from omnimamba_tpu.data.native import NativeCocoReader, native_available

    if not native_available():
        pytest.skip("native lib not built")
    p = tmp_path / "bad.jsonl"
    p.write_text('{"captions": ["a"], "tokens": [1, 2]}\n{"no_tokens": true}\n')
    r = NativeCocoReader(str(p))
    r.read_batch(np.array([0]), num_tokens=2)  # fine
    with pytest.raises(ValueError):
        r.read_batch(np.array([1]), num_tokens=2)
    r.close()


def test_mesh_shape_validation():
    from omnimamba_tpu.parallel.mesh import create_mesh

    with pytest.raises(AssertionError):
        create_mesh({"dp": 3, "tp": 5})  # 15 != 8 devices


def test_llava_missing_image_fallback(tmp_path):
    from omnimamba_tpu.data.llava import FinetuneDataset, PaddedCollatorForLanguageModeling
    from omnimamba_tpu.data.tokenizer import OfflineTokenizer, add_omnimamba_tokens

    rows = [{
        "image": "does_not_exist.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\nq?"},
            {"from": "gpt", "value": "answer."},
        ],
    }]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(rows))
    tok = OfflineTokenizer()
    add_omnimamba_tokens(tok)  # gives the tokenizer its [PAD]
    ds = FinetuneDataset(str(p), str(tmp_path), tok, max_length=16, image_size=28)
    item = ds[0]
    assert item["pixel_values"] is None  # corrupt-image fallback
    coll = PaddedCollatorForLanguageModeling(16, 0, image_size=28)
    batch = coll([item])
    assert batch["multimodal_mask"][0] == False  # noqa: E712
    assert batch["pixel_values"].shape == (1, 28, 28, 3)


def test_generate_rejects_short_max_length():
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(6, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    with pytest.raises(AssertionError):
        generate(params, cfg, input_ids=ids, input_embeddings=emb,
                 task="mmu", max_length=6)
