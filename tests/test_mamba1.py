"""Mamba-1 selective scan: parallel scan vs sequential, step consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.models.mamba1 import (
    Mamba1LayerConfig,
    init_mamba1,
    init_mamba1_cache,
    mamba1_forward,
    mamba1_step,
    selective_scan,
)


def test_selective_scan_vs_sequential():
    B, L, di, N = 2, 17, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    xs = jax.random.normal(ks[0], (B, L, di))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, di)) - 1.0)
    A = -jnp.exp(jax.random.normal(ks[2], (di, N)) * 0.5)
    Bm = jax.random.normal(ks[3], (B, L, N))
    Cm = jax.random.normal(ks[4], (B, L, N))
    D = jnp.linspace(0.5, 1.5, di)

    y_par, h_par = selective_scan(xs, dt, A, Bm, Cm, D)

    h = jnp.zeros((B, di, N))
    ys = []
    for t in range(L):
        a = jnp.exp(dt[:, t, :, None] * A[None])
        b = (dt[:, t] * xs[:, t])[..., None] * Bm[:, t, None, :]
        h = h * a + b
        y = jnp.einsum("bdn,bn->bd", h, Cm[:, t]) + xs[:, t] * D
        ys.append(y)
    y_seq = jnp.stack(ys, 1)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_par), np.asarray(h), rtol=1e-4, atol=1e-4)


def test_selective_scan_initial_state():
    B, L, di, N = 1, 12, 4, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    xs = jax.random.normal(ks[0], (B, L, di))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, di)))
    A = -jnp.exp(jax.random.normal(ks[2], (di, N)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, N))
    Cm = jax.random.normal(ks[4], (B, L, N))
    y_full, h_full = selective_scan(xs, dt, A, Bm, Cm, None)
    y1, h1 = selective_scan(xs[:, :7], dt[:, :7], A, Bm[:, :7], Cm[:, :7], None)
    y2, h2 = selective_scan(
        xs[:, 7:], dt[:, 7:], A, Bm[:, 7:], Cm[:, 7:], None, initial_state=h1
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_full), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full), rtol=1e-4, atol=1e-4)


def test_mamba1_prefill_then_step():
    cfg = Mamba1LayerConfig(d_model=32, d_state=8)
    params = init_mamba1(jax.random.PRNGKey(2), cfg, n_layer=2)
    B, L, L1 = 1, 14, 9
    x = jax.random.normal(jax.random.PRNGKey(3), (B, L, cfg.d_model))
    y_full, _ = mamba1_forward(params, x, cfg)
    y_pre, cache = mamba1_forward(params, x[:, :L1], cfg, return_cache=True)
    np.testing.assert_allclose(
        np.asarray(y_pre), np.asarray(y_full[:, :L1]), rtol=1e-4, atol=1e-4
    )
    for t in range(L1, L):
        y_t, cache = mamba1_step(params, x[:, t], cache, cfg)
        np.testing.assert_allclose(
            np.asarray(y_t), np.asarray(y_full[:, t]), rtol=1e-4, atol=1e-4
        )


def test_mamba1_cache_shapes():
    cfg = Mamba1LayerConfig(d_model=32, d_state=8)
    c = init_mamba1_cache(3, cfg)
    assert c.conv_state.shape == (3, cfg.d_conv - 1, cfg.d_inner)
    assert c.ssm_state.shape == (3, cfg.d_inner, cfg.d_state)
