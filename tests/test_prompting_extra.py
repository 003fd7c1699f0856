"""Prompting layer: exact sequence layouts, lvg variants, streaming hook."""

import numpy as np

from omnimamba_tpu.data.prompting import UniversalPrompting
from omnimamba_tpu.data.tokenizer import OfflineTokenizer


def make_uni():
    return UniversalPrompting(OfflineTokenizer(), max_text_len=10, cond_dropout_prob=0.0)


def test_special_token_id_layout():
    """Reference id layout: [PAD]=50277 then 9 specials (SURVEY §2.1)."""
    uni = make_uni()
    sp = uni.sptids_dict
    assert sp["<|pad|>"] == 50277
    assert sp["<|soi|>"] == 50278
    assert sp["<|eoi|>"] == 50279
    assert sp["<|sot|>"] == 50280
    assert sp["<|eot|>"] == 50281
    assert sp["<|t2i|>"] == 50282
    assert sp["<|mmu|>"] == 50283
    assert sp["<|lvg|>"] == 50286
    assert len(uni.text_tokenizer) == 50287


def test_t2i_prompt_layout():
    uni = make_uni()
    img = np.arange(4)[None]
    labels = np.arange(4)[None] + 100
    seq, mask, lab = uni.t2i_prompt([[5, 6]], img, labels)
    sp = uni.sptids_dict
    # [pad* | t2i bos 5 6 eos | soi | img | eoi]
    assert seq.shape == (1, 11 + 4 + 2)
    assert seq[0, -6] == sp["<|soi|>"] and seq[0, -1] == sp["<|eoi|>"]
    assert lab[0, 0] == -100  # pads masked
    np.testing.assert_array_equal(lab[0, -5:-1], labels[0])


def test_mmu_prompt_layout():
    uni = make_uni()
    img = np.arange(3)[None]
    seq, mask, lab = uni.mmu_prompt(img, [[7, 8]])
    sp = uni.sptids_dict
    assert seq[0, 0] == sp["<|mmu|>"] and seq[0, 1] == sp["<|soi|>"]
    assert seq[0, 5] == sp["<|eoi|>"]
    # labels ignore through the image region
    assert all(lab[0, :6] == -100)


def test_lvg_variants_match_t2i():
    uni = make_uni()
    img = np.arange(4)[None]
    labels = np.arange(4)[None]
    a = uni.lvg_prompt([[5]], img, labels)
    b = uni.t2i_prompt([[5]], img, labels)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    seq, mask = uni.lvg_gen_prompt([[5]], img)
    assert seq.shape[0] == 1


def test_dispatcher_tasks():
    uni = make_uni()
    img = np.arange(4)[None]
    out = uni((["hello world"], img, np.arange(4)[None]), task="t2i")
    assert len(out) == 3
    out = uni((["hello"], 8), task="lm")
    assert out[0].shape == (1, 8)
    out = uni((img, ["question here"]), task="mmu")
    assert len(out) == 3
    out = uni((["cap"], img, np.arange(4)[None]), task="lvg")
    assert len(out) == 3


def test_streaming_token_callback():
    """generate() delivers sampled tokens through io_callback in order."""
    import jax
    import jax.numpy as jnp

    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(4, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    received = []
    out = generate(
        params, cfg, input_ids=ids, input_embeddings=emb, task="mmu",
        max_length=10, sample=SampleParams(top_k=1), scan_impl="chunked",
        token_callback=lambda t: received.append(np.asarray(t).copy()),
    )
    streamed = np.concatenate(received)
    np.testing.assert_array_equal(streamed, np.asarray(out.sequences[0, 4:]))
