"""Sequence-parallel SSD (state passing over an 'sp' axis) vs single-device
scan on the 8-device virtual CPU mesh — the long-context strategy of
SURVEY §5.7."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.collective
from jax.sharding import Mesh

from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.parallel.sequence import ssd_sequence_parallel
from tests.test_ssd import _random_ssd_inputs


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_sp_matches_single_device(n_sp):
    devs = np.asarray(jax.devices()[:n_sp])
    mesh = Mesh(devs, ("sp",))
    # L divisible by n_sp * chunk for clean sharding
    L = n_sp * 32
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(
        jax.random.PRNGKey(0), B=2, L=L, H=4, P=8, G=2, N=16
    )
    y_ref, s_ref = ssd_chunked(x, dt, A, Bm, Cm, D, chunk_size=16)
    y_sp, s_sp = ssd_sequence_parallel(
        mesh, x, dt, A, Bm, Cm, D, chunk_size=16
    )
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s_sp), np.asarray(s_ref), rtol=3e-4, atol=3e-4)


def test_sp_long_sequence_smoke():
    """32K tokens across 8 shards — constant per-shard memory."""
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("sp",))
    B, L, H, P, G, N = 1, 8 * 4096, 2, 8, 1, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (B, L, H, P), jnp.float32)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, H)) - 1.0)
    A = -jnp.exp(jax.random.uniform(ks[2], (H,), minval=0.0, maxval=1.0))
    Bm = jax.random.normal(ks[3], (B, L, G, N)) / np.sqrt(N)
    Cm = jax.random.normal(ks[4], (B, L, G, N)) / np.sqrt(N)
    y, s = ssd_sequence_parallel(mesh, x, dt, A, Bm, Cm, None, chunk_size=256)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(jnp.asarray(s)).all())


def test_backbone_sp_matches_single_device():
    """Whole-model sp prefill == regular forward (conv halos + per-layer
    state passing end-to-end)."""
    from omnimamba_tpu.models.backbone import (
        backbone_forward,
        backbone_forward_sp,
        embed_text,
        init_backbone,
    )
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("sp",))
    B, L = 2, 4 * 16  # 16 tokens per shard (chunk 8)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, cfg.vocab_size)
    emb = embed_text(params, ids, jnp.float32)

    h_ref, _ = backbone_forward(params, emb, "mmu", cfg, scan_impl="chunked")
    h_sp = backbone_forward_sp(params, emb, "mmu", cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(h_sp), np.asarray(h_ref), rtol=5e-4, atol=5e-4
    )
