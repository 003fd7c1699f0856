"""Pallas SSD kernel vs the sequential oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.ops.ssd_pallas import ssd_pallas
from omnimamba_tpu.ops.ssd_reference import ssd_scan_reference
from tests.test_ssd import _random_ssd_inputs


@pytest.mark.parametrize("L,Q", [(32, 8), (64, 16), (24, 8)])
def test_pallas_matches_reference(L, Q):
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(0), B=2, L=L, H=4, P=8, G=2, N=16)
    y_ref, s_ref = ssd_scan_reference(x, dt, A, Bm, Cm, D)
    y_pal, s_pal = ssd_pallas(x, dt, A, Bm, Cm, D, chunk_size=Q, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("L,Q", [(300, 256), (768, 384)])
def test_pallas_subtiled_matches_reference(L, Q):
    """Q>=256 activates the 128-wide sub-tile decomposition of the causal
    block in the FORWARD kernel (Q=256: nt=2 + ragged tail padding; Q=384:
    nt=3, distance-2 off-diagonal tiles). The backward-side grad tests
    can't see forward output errors (linear loss -> constant cotangents),
    so parity is asserted here directly."""
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(
        jax.random.PRNGKey(4), B=1, L=L, H=2, P=8, G=1, N=16
    )
    y_ref, s_ref = ssd_scan_reference(x, dt, A, Bm, Cm, D)
    y_pal, s_pal = ssd_pallas(x, dt, A, Bm, Cm, D, chunk_size=Q, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(s_pal), np.asarray(s_ref), rtol=2e-3, atol=2e-3
    )


def test_pallas_no_D():
    x, dt, A, Bm, Cm, _ = _random_ssd_inputs(jax.random.PRNGKey(1), B=1, L=16, H=2, P=8, G=1, N=8)
    y_ref, _ = ssd_scan_reference(x, dt, A, Bm, Cm, None)
    y_pal, _ = ssd_pallas(x, dt, A, Bm, Cm, None, chunk_size=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=2e-4, atol=2e-4)


def test_pallas_bf16_activations():
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(2), B=1, L=32, H=2, P=8, G=1, N=8)
    y32, _ = ssd_pallas(x, dt, A, Bm, Cm, D, chunk_size=16, interpret=True)
    y16, _ = ssd_pallas(
        x.astype(jnp.bfloat16), dt, A,
        Bm.astype(jnp.bfloat16), Cm.astype(jnp.bfloat16), D,
        chunk_size=16, interpret=True,
    )
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), rtol=0.1, atol=0.1
    )


def test_pallas_prefill_cache_continuation():
    """Mixer prefill with the Pallas scan -> recurrent steps == full forward."""
    import numpy as np

    from omnimamba_tpu.config import LoraConfig, Mamba2LayerConfig
    from omnimamba_tpu.models.mamba2 import init_mamba2, mamba2_forward, mamba2_step

    cfg = Mamba2LayerConfig(d_model=32, d_state=16, headdim=8, expand=2, chunk_size=8)
    lora = LoraConfig()
    params = init_mamba2(jax.random.PRNGKey(0), cfg, lora, n_layer=2)
    B, L, L1 = 1, 20, 13
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.d_model))
    y_full, _ = mamba2_forward(params, x, "mmu", cfg, lora, scan_impl="reference")
    y_pre, cache = mamba2_forward(
        params, x[:, :L1], "mmu", cfg, lora, scan_impl="pallas", return_cache=True
    )
    np.testing.assert_allclose(
        np.asarray(y_pre), np.asarray(y_full[:, :L1]), rtol=1e-4, atol=1e-4
    )
    for t in range(L1, L):
        y_t, cache = mamba2_step(params, x[:, t], cache, "mmu", cfg, lora)
        np.testing.assert_allclose(
            np.asarray(y_t), np.asarray(y_full[:, t]), rtol=1e-4, atol=1e-4
        )
