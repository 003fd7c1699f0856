"""Weight conversion (reference torch layout -> pytree) and checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omnimamba_tpu.config import MambaConfig, Mamba2LayerConfig, VQConfig
from omnimamba_tpu.models.backbone import init_backbone
from omnimamba_tpu.models.vq import init_vq
from omnimamba_tpu.utils.convert import (
    convert_mamba_lm,
    convert_vq,
)


def tiny_cfg():
    mixer = Mamba2LayerConfig(d_model=32, d_state=16, headdim=8, expand=2, chunk_size=8)
    return MambaConfig(
        d_model=32, n_layer=2, vocab_size=64, vqvae_vocab_size=32,
        num_tokens=8, mmu_pos_len=64, pad_vocab_size_multiple=16, mixer=mixer,
    )


def reference_style_state_dict(cfg: MambaConfig, rng) -> dict:
    """Synthesize a state dict with the reference's exact names/shapes
    (mixer_seq_simple.py + lora.py layouts)."""
    m = cfg.mixer
    d, d_inner, H, W = cfg.d_model, m.d_inner, m.nheads, m.d_conv
    d_in_proj = m.d_in_proj
    d_conv_in = m.d_conv_in
    r = cfg.lora.r
    sd = {
        "backbone.embedding.weight": rng.normal(size=(cfg.padded_vocab_size, d)),
        "backbone.img_embeddings.word_embeddings.weight": rng.normal(
            size=(cfg.vqvae_vocab_size, d)
        ),
        "backbone.pos_embed": rng.normal(size=(1, cfg.t2i_pos_len, d)),
        "backbone.mmu_pos_embed": rng.normal(size=(1, cfg.mmu_pos_len, d)),
        "backbone.caption_embed.cap_proj.fc1.weight": rng.normal(size=(d, d)),
        "backbone.caption_embed.cap_proj.fc2.weight": rng.normal(size=(d, d)),
        "backbone.norm_f.weight": rng.normal(size=(d,)),
    }
    for j, k in [(0, "fc1"), (2, "fc2"), (4, "fc3")]:
        dims = {(0): (4 * d, d), (2): (d, 4 * d), (4): (d, d)}[j]
        sd[f"backbone.img_embeddings.project_in.projector.{j}.weight"] = rng.normal(size=dims)
        sd[f"backbone.img_embeddings.project_in.projector.{j}.bias"] = rng.normal(size=(dims[0],))
    for i in range(cfg.n_layer):
        p = f"backbone.layers.{i}"
        sd[f"{p}.norm.weight"] = rng.normal(size=(d,))
        sd[f"{p}.mixer.in_proj.weight"] = rng.normal(size=(d_in_proj, d))
        sd[f"{p}.mixer.conv1d.weight"] = rng.normal(size=(d_conv_in, 1, W))
        sd[f"{p}.mixer.conv1d.bias"] = rng.normal(size=(d_conv_in,))
        sd[f"{p}.mixer.dt_bias"] = rng.normal(size=(H,))
        sd[f"{p}.mixer.A_log"] = rng.normal(size=(H,))
        sd[f"{p}.mixer.D"] = rng.normal(size=(H,))
        sd[f"{p}.mixer.norm.weight"] = rng.normal(size=(d_inner,))
        sd[f"{p}.mixer.out_proj.weight"] = rng.normal(size=(d, d_inner))
        for task in ("t2i", "mmu"):
            sd[f"{p}.mixer.in_proj.{task}_lora_A0.weight"] = rng.normal(size=(r, d))
            sd[f"{p}.mixer.in_proj.{task}_lora_B0.weight"] = rng.normal(size=(d_in_proj, r))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_mamba_conversion_structure_and_fusion():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    sd = reference_style_state_dict(cfg, rng)
    params = convert_mamba_lm(sd, cfg)

    ref_shapes = jax.tree.map(lambda x: x.shape, init_backbone(jax.random.PRNGKey(0), cfg))
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    # fused in_proj == concat of our column slices
    m = cfg.mixer
    x = rng.normal(size=(3, cfg.d_model)).astype(np.float32)
    fused = x @ sd["backbone.layers.0.mixer.in_proj.weight"].T
    ours = np.concatenate(
        [x @ params["layers"]["mixer"]["in_proj"][p][0] for p in ("z", "x", "bc", "dt")],
        axis=-1,
    )
    np.testing.assert_allclose(ours, fused, rtol=1e-5, atol=1e-5)

    # conv weight split preserves channel order [x | B | C]
    cw = sd["backbone.layers.0.mixer.conv1d.weight"][:, 0, :].T
    np.testing.assert_array_equal(
        np.concatenate(
            [
                params["layers"]["mixer"]["conv"]["weight_x"][0],
                params["layers"]["mixer"]["conv"]["weight_bc"][0],
            ],
            axis=-1,
        ),
        cw,
    )


def reference_style_vq_state_dict(cfg, rng) -> dict:
    """Synthetic VQModel state dict with the reference's exact names/shapes
    (vq_model.py layout), for converter structure + numerics tests."""
    sd = {}

    def put_conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(cout,)).astype(np.float32)

    def put_gn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)

    def put_res(name, cin, cout):
        put_gn(f"{name}.norm1", cin)
        put_conv(f"{name}.conv1", cin, cout, 3)
        put_gn(f"{name}.norm2", cout)
        put_conv(f"{name}.conv2", cout, cout, 3)
        if cin != cout:
            put_conv(f"{name}.nin_shortcut", cin, cout, 1)

    def put_attn(name, c):
        put_gn(f"{name}.norm", c)
        for q in ("q", "k", "v", "proj_out"):
            put_conv(f"{name}.{q}", c, c, 1)

    ch = cfg.ch
    in_mult = (1,) + tuple(cfg.encoder_ch_mult)
    put_conv("encoder.conv_in", 3, ch, 3)
    n_lv = len(cfg.encoder_ch_mult)
    for i in range(n_lv):
        cin, cout = ch * in_mult[i], ch * cfg.encoder_ch_mult[i]
        c = cin
        for j in range(cfg.num_res_blocks):
            put_res(f"encoder.conv_blocks.{i}.res.{j}", c, cout)
            c = cout
            if i == n_lv - 1:
                put_attn(f"encoder.conv_blocks.{i}.attn.{j}", c)
        if i != n_lv - 1:
            put_conv(f"encoder.conv_blocks.{i}.downsample.conv", c, c, 3)
    cmid = ch * cfg.encoder_ch_mult[-1]
    put_res("encoder.mid.0", cmid, cmid)
    put_attn("encoder.mid.1", cmid)
    put_res("encoder.mid.2", cmid, cmid)
    put_gn("encoder.norm_out", cmid)
    put_conv("encoder.conv_out", cmid, cfg.z_channels, 3)

    block_in = ch * cfg.decoder_ch_mult[-1]
    put_conv("decoder.conv_in", cfg.z_channels, block_in, 3)
    put_res("decoder.mid.0", block_in, block_in)
    put_attn("decoder.mid.1", block_in)
    put_res("decoder.mid.2", block_in, block_in)
    c = block_in
    for s, i_level in enumerate(reversed(range(n_lv))):
        cout = ch * cfg.decoder_ch_mult[i_level]
        for j in range(cfg.num_res_blocks + 1):
            put_res(f"decoder.conv_blocks.{s}.res.{j}", c, cout)
            c = cout
            if i_level == n_lv - 1:
                put_attn(f"decoder.conv_blocks.{s}.attn.{j}", c)
        if i_level != 0:
            put_conv(f"decoder.conv_blocks.{s}.upsample.conv", c, c, 3)
    put_gn("decoder.norm_out", c)
    put_conv("decoder.conv_out", c, 3, 3)
    put_conv("quant_conv", cfg.z_channels, cfg.codebook_embed_dim, 1)
    put_conv("post_quant_conv", cfg.codebook_embed_dim, cfg.z_channels, 1)
    sd["quantize.embedding.weight"] = rng.normal(
        size=(cfg.codebook_size, cfg.codebook_embed_dim)
    ).astype(np.float32)
    sd["quantize.codebook_used"] = np.zeros(65536, np.float32)  # must be dropped
    return sd


def test_vq_conversion_structure():
    from tests.test_vq import small_cfg

    cfg = small_cfg()
    params_init = init_vq(jax.random.PRNGKey(0), cfg)
    sd = reference_style_vq_state_dict(cfg, np.random.default_rng(1))
    params = convert_vq(sd, cfg)
    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), params_init)
    got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
    assert ref_shapes == got_shapes


def test_npz_roundtrip(tmp_path):
    from omnimamba_tpu.utils.checkpoint import load_params_npz, save_params_npz

    cfg = tiny_cfg()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path, params)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp

    from omnimamba_tpu.utils.checkpoint import CheckpointManager

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.int32(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpts"), save_total_limit=2)
    mgr.save(1, state, wait=True)
    mgr.save(2, jax.tree.map(lambda x: x + 1, state), wait=True)
    assert mgr.latest_step() == 2
    restored = mgr.restore(jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(state["w"]) + 1)
    mgr.close()
