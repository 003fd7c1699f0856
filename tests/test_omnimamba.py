"""Top-level OmniMamba composition: losses, generation APIs, gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import (
    Mamba2LayerConfig,
    MambaConfig,
    ViTConfig,
    VisionConfig,
    VQConfig,
)
from omnimamba_tpu.models.omnimamba import (
    IGNORE_INDEX,
    OmniMambaModel,
    cross_entropy,
    init_omnimamba,
    mmu_generate,
    mmu_image_features,
    mmu_loss,
    t2i_generate,
    t2i_loss,
)
from omnimamba_tpu.ops.sampling import SampleParams


def tiny_model() -> OmniMambaModel:
    mixer = Mamba2LayerConfig(d_model=32, d_state=16, headdim=8, expand=2, chunk_size=16)
    cfg = MambaConfig(
        d_model=32, n_layer=2, vocab_size=64, vqvae_vocab_size=32,
        num_tokens=16, mmu_pos_len=128, pad_vocab_size_multiple=16, mixer=mixer,
    )
    vit = ViTConfig(img_size=28, patch_size=14, width=16, depth=2, num_heads=2)
    vit_sig = ViTConfig(
        img_size=28, patch_size=14, width=24, depth=2, num_heads=2,
        use_cls_token=False,
    )
    vision = VisionConfig(dino=vit, siglip=vit_sig)
    vq = VQConfig(
        codebook_size=32, codebook_embed_dim=8, ch=16, num_res_blocks=1,
        encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2), z_channels=16,
    )
    sptids = {
        "<|soi|>": 50, "<|eoi|>": 51, "<|sot|>": 52, "<|eot|>": 53,
        "<|t2i|>": 54, "<|mmu|>": 55, "<|soc|>": 56, "<|eoc|>": 57,
        "<|lvg|>": 58, "<|pad|>": 49,
    }
    return OmniMambaModel(cfg=cfg, vision_cfg=vision, vq_cfg=vq, sptids=sptids)


@pytest.fixture(scope="module")
def omni():
    model = tiny_model()
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    return model, params


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.array([[1, IGNORE_INDEX, 2], [IGNORE_INDEX] * 3])
    loss = cross_entropy(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(5.0), rtol=1e-4)


def test_t2i_loss_and_grad(omni):
    model, params = omni
    B = 2
    n_cap = 8
    image_ids = jax.random.randint(jax.random.PRNGKey(1), (B, model.cfg.num_tokens), 0, 32)
    caption_ids = jax.random.randint(jax.random.PRNGKey(2), (B, n_cap), 0, 49)

    loss_fn = functools.partial(t2i_loss, model=model, dtype=jnp.float32)
    loss = jax.jit(lambda p: loss_fn(p, image_ids=image_ids, caption_ids=caption_ids))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0

    g = jax.jit(jax.grad(lambda p: loss_fn(p, image_ids=image_ids, caption_ids=caption_ids)))(params)
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g["mamba"]))
    assert np.isfinite(gmax) and gmax > 0
    # loss only supervises image positions: caption table grads exist via
    # embeddings; vq params get no grads (not used in loss)
    assert "vq" not in g or all(
        float(jnp.abs(x).max()) == 0 for x in jax.tree.leaves(g.get("vq", {}))
    )


def test_mmu_loss_multimodal_and_textonly(omni):
    model, params = omni
    B, T = 2, 10
    pix = {
        "dino": jnp.ones((B, 28, 28, 3)),
        "siglip": jnp.ones((B, 28, 28, 3)),
    }
    input_ids = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, 49)
    labels = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(4), (B, T)) < 0.3, IGNORE_INDEX, input_ids
    )
    mask_all = jnp.array([True, True])
    mask_mixed = jnp.array([True, False])
    f = jax.jit(
        lambda p, m: mmu_loss(
            p, model, pix, input_ids, labels, m, dtype=jnp.float32
        )
    )
    l1, l2 = f(params, mask_all), f(params, mask_mixed)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)  # zeroed image features change the loss


def test_t2i_generate_tokens_and_image(omni):
    model, params = omni
    B, n_cap = 1, 6
    text_ids = jax.random.randint(jax.random.PRNGKey(5), (B, n_cap), 0, 49)
    imgs, tokens = t2i_generate(
        params, model, text_ids, sample=SampleParams(top_k=1), dtype=jnp.float32
    )
    assert tokens.shape == (B, model.cfg.num_tokens)
    assert int(tokens.max()) < model.cfg.vqvae_vocab_size
    # 16 tokens on a 4x4 grid, f2 model -> 8x8 image
    assert imgs.shape == (B, 8, 8, 3)


def test_t2i_generate_cfg_dual_stream(omni):
    model, params = omni
    n_cap = 6
    cond = jax.random.randint(jax.random.PRNGKey(6), (1, n_cap), 0, 49)
    uncond = jnp.full((1, n_cap), 49, jnp.int32)
    packed = jnp.concatenate([cond, uncond], axis=0)
    _, tokens = t2i_generate(
        params, model, packed, sample=SampleParams(top_k=1),
        cfg_scale=3.0, dtype=jnp.float32, decode_image=False,
    )
    assert tokens.shape == (1, model.cfg.num_tokens)


def test_t2i_cfg_sampling_streams_consume_same_tokens(omni):
    """Stochastic CFG: one draw per IMAGE — the cond and uncond streams must
    consume the identical sampled token each step (generation.py body_fn
    tiles the cond half's draw), else the uncond state silently diverges."""
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.models.backbone import embed_text, caption_embed

    model, params = omni
    n_img, n_cap = 2, 6
    cond = jax.random.randint(jax.random.PRNGKey(8), (n_img, n_cap), 0, 49)
    uncond = jnp.full((n_img, n_cap), 49, jnp.int32)
    packed = jnp.concatenate([cond, uncond], axis=0)
    emb = caption_embed(params["mamba"], embed_text(params["mamba"], packed, jnp.float32))
    emb = emb + params["mamba"]["pos_embed"][:, :n_cap].astype(jnp.float32)
    out = generate(
        params["mamba"], model.cfg, input_ids=packed, input_embeddings=emb,
        task="t2i", max_length=n_cap + 8,
        sample=SampleParams(top_k=8, top_p=0.95, temperature=2.0),
        key=jax.random.PRNGKey(3), cfg_scale=3.0,
    )
    gen_tokens = np.asarray(out.sequences)[:, n_cap:]
    np.testing.assert_array_equal(gen_tokens[:n_img], gen_tokens[n_img:])
    # sampling actually sampled (not argmax-collapsed): repeat with greedy
    out_g = generate(
        params["mamba"], model.cfg, input_ids=packed, input_embeddings=emb,
        task="t2i", max_length=n_cap + 8, sample=SampleParams(top_k=1),
        cfg_scale=3.0,
    )
    assert not np.array_equal(np.asarray(out_g.sequences)[:, n_cap:], gen_tokens)


def test_t2i_generate_ragged_matches_solo(omni):
    """Ragged t2i (text_lengths): each right-padded row's tokens must equal
    its own solo un-padded run."""
    model, params = omni
    lens = [4, 6]
    rows = [jax.random.randint(jax.random.PRNGKey(10 + i), (1, L), 0, 49)
            for i, L in enumerate(lens)]
    L0 = max(lens)
    padded = jnp.stack([
        jnp.pad(r[0], (0, L0 - r.shape[1]), constant_values=0) for r in rows
    ])
    _, ragged_toks = t2i_generate(
        params, model, padded, sample=SampleParams(top_k=1),
        dtype=jnp.float32, decode_image=False,
        text_lengths=jnp.asarray(lens),
    )
    for i, r in enumerate(rows):
        _, solo = t2i_generate(
            params, model, r, sample=SampleParams(top_k=1),
            dtype=jnp.float32, decode_image=False,
        )
        np.testing.assert_array_equal(np.asarray(ragged_toks[i]), np.asarray(solo[0]))


def test_mmu_generate(omni):
    model, params = omni
    B = 1
    pix = {"dino": jnp.ones((B, 28, 28, 3)), "siglip": jnp.ones((B, 28, 28, 3))}
    feats = mmu_image_features(params, model, pix)
    assert feats.shape == (B, 4, model.cfg.d_model)  # 2x2 patches per tiny ViT
    prompt = jnp.array([[model.sptids["<|mmu|>"], model.sptids["<|soi|>"],
                         model.sptids["<|eoi|>"], model.sptids["<|sot|>"], 7, 8]],
                       jnp.int32)
    out = mmu_generate(
        params, model, prompt, feats, max_length=20, dtype=jnp.float32
    )
    assert out.sequences.shape[1] == 20


def test_mmu_generate_speculative_matches_plain(omni):
    """mmu_generate(draft_layers=...) must emit the same stream as the
    plain greedy path (speculation is a pure speedup)."""
    model, params = omni
    pix = {"dino": jnp.ones((1, 28, 28, 3)), "siglip": jnp.ones((1, 28, 28, 3))}
    feats = mmu_image_features(params, model, pix)
    prompt = jnp.array([[model.sptids["<|mmu|>"], model.sptids["<|soi|>"],
                         model.sptids["<|eoi|>"], model.sptids["<|sot|>"], 7, 8]],
                       jnp.int32)
    ref = mmu_generate(
        params, model, prompt, feats, max_length=20, dtype=jnp.float32
    )
    out = mmu_generate(
        params, model, prompt, feats, max_length=20, dtype=jnp.float32,
        draft_layers=2, k_draft=4,
    )
    np.testing.assert_array_equal(out.sequences, ref.sequences)


def test_mmu_generate_ngram_speculative(omni):
    model, params = omni
    pix = {"dino": jnp.ones((1, 28, 28, 3)), "siglip": jnp.ones((1, 28, 28, 3))}
    feats = mmu_image_features(params, model, pix)
    prompt = jnp.array([[model.sptids["<|mmu|>"], model.sptids["<|soi|>"],
                         model.sptids["<|eoi|>"], model.sptids["<|sot|>"], 7, 8]],
                       jnp.int32)
    ref = mmu_generate(
        params, model, prompt, feats, max_length=20, dtype=jnp.float32
    )
    out = mmu_generate(
        params, model, prompt, feats, max_length=20, dtype=jnp.float32,
        draft_mode="ngram", k_draft=4,
    )
    np.testing.assert_array_equal(out.sequences, ref.sequences)
