"""Eval metrics + fidelity harness + logging/profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.eval.fidelity import compare_streams, greedy_stream
from omnimamba_tpu.eval.reconstruction import FeatureStats, psnr, ssim
from omnimamba_tpu.utils.logging import initialize_overwatch
from omnimamba_tpu.utils.profiling import Timer, hard_sync


def test_psnr_identity_and_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3), minval=-1, maxval=1)
    assert float(psnr(img, img).min()) > 100
    noisy = img + 0.1 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
    p = psnr(img, noisy)
    assert 15 < float(p.mean()) < 35


def test_ssim_bounds():
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3), minval=-1, maxval=1)
    s_same = float(ssim(img, img)[0])
    assert s_same > 0.99
    other = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3), minval=-1, maxval=1)
    assert float(ssim(img, other)[0]) < s_same


def test_feature_stats_match_numpy():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 8))
    fs = FeatureStats(8)
    fs.update(feats[:200])
    fs.update(feats[200:])
    mu, cov = fs.finalize()
    np.testing.assert_allclose(mu, feats.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(feats.T), rtol=1e-8)


def test_compare_streams():
    a = np.array([1, 2, 3, 4])
    d = compare_streams(a, a)
    assert d.match and d.first_divergence == -1
    b = np.array([1, 2, 9, 4])
    d = compare_streams(a, b)
    assert not d.match and d.first_divergence == 2 and d.mismatch_count == 1


def test_greedy_stream_impl_agreement():
    """chunked vs reference scan produce identical greedy streams in fp32 —
    the core BASELINE fidelity protocol applied across our own impls."""
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(6, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    s1 = greedy_stream(params, cfg, ids, emb, "mmu", 18, scan_impl="chunked")
    s2 = greedy_stream(params, cfg, ids, emb, "mmu", 18, scan_impl="reference")
    assert compare_streams(s1, s2).match


def test_overwatch_and_timer(capsys):
    ow = initialize_overwatch("test")
    ow.info("hello", ctx_level=1)
    assert ow.is_rank_zero()
    with Timer("t") as t:
        hard_sync(jnp.ones(4) * 2)
    assert t.elapsed >= 0


def test_fidelity_pack_roundtrip_and_divergence(tmp_path):
    """record_pack -> save -> load -> compare: identical params match;
    perturbed params are flagged with a localized first divergence."""
    import jax
    import jax.numpy as jnp

    from omnimamba_tpu.eval.fidelity import (
        compare_to_pack, load_pack, record_pack, save_pack,
    )
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(11), cfg)
    ids = jnp.arange(5, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    pack = record_pack(params, cfg, ids, emb, "mmu", 15, k_logits=4,
                       meta={"who": "self"})
    p = str(tmp_path / "pack.npz")
    save_pack(p, pack)
    loaded = load_pack(p)
    assert loaded.task == "mmu" and loaded.meta["who"] == "self"

    rep = compare_to_pack(params, cfg, loaded, emb)
    assert rep["stream"].match and rep["logits_close"]

    bad = dict(params)
    bad["embedding"] = params["embedding"] + 0.05
    bad_emb = embed_text(bad, ids, jnp.float32)
    rep2 = compare_to_pack(bad, cfg, loaded, bad_emb)
    assert not rep2["logits_close"]


def test_compare_to_pack_teacher_forces_recorded_stream(tmp_path):
    """Logit deltas must be computed under the PACK's prefix, not our own
    greedy continuation: a pack whose stream diverges from our argmax at
    the first generated position must still report logits_close when the
    model numerics are identical (prefix divergence != numeric divergence)."""
    import jax
    import jax.numpy as jnp

    from omnimamba_tpu.eval.fidelity import (
        FidelityPack, compare_to_pack, record_pack, teacher_forced_logits,
    )
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(3), cfg)
    ids = jnp.arange(5, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)
    pack = record_pack(params, cfg, ids, emb, "mmu", 15, k_logits=4)

    # force the recorded stream off our greedy path right after the prompt
    # (as if the producer had sampled), and re-record its logits under that
    # stream — a numerics-identical model must match them exactly
    mutated = np.array(pack.stream)
    L0 = ids.shape[1]
    mutated[0, L0] = (mutated[0, L0] + 1) % cfg.vocab_size
    mut_logits = teacher_forced_logits(
        params, cfg, emb, mutated, L0, pack.logits.shape[1], "mmu")
    mut_pack = FidelityPack("mmu", pack.prompt_ids, mutated, mut_logits, {})

    rep = compare_to_pack(params, cfg, mut_pack, emb)
    assert not rep["stream"].match  # greedy argmax disagrees with the pack
    assert rep["logits_close"]  # ...but numerics match under its prefix
    assert float(rep["max_logit_delta"].max()) < 1e-5
