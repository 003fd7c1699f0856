"""SSD kernel correctness: chunked-XLA vs the sequential oracle, decode-step
consistency, conv equivalence, and mixer-level prefill/step agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.config import LoraConfig, Mamba2LayerConfig
from omnimamba_tpu.models.mamba2 import (
    init_cache,
    init_mamba2,
    mamba2_forward,
    mamba2_step,
)
from omnimamba_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_step,
    conv_state_from_sequence,
)
from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.ops.ssd_reference import ssd_scan_reference, ssd_step


def _random_ssd_inputs(key, B=2, L=100, H=4, P=8, G=2, N=16):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, L, H, P), jnp.float32)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, H)) - 1.0)
    A = -jnp.exp(jax.random.uniform(ks[2], (H,), minval=0.0, maxval=1.5))
    Bm = jax.random.normal(ks[3], (B, L, G, N)) / np.sqrt(N)
    Cm = jax.random.normal(ks[4], (B, L, G, N)) / np.sqrt(N)
    D = jnp.linspace(0.5, 1.5, H)
    return x, dt, A, Bm, Cm, D


@pytest.mark.parametrize("chunk_size", [16, 32, 256])
@pytest.mark.parametrize("L", [1, 5, 32, 100])
def test_chunked_matches_reference(chunk_size, L):
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(0), L=L)
    y_ref, state_ref = ssd_scan_reference(x, dt, A, Bm, Cm, D)
    y_chk, state_chk = ssd_chunked(x, dt, A, Bm, Cm, D, chunk_size=chunk_size)
    np.testing.assert_allclose(y_chk, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(state_chk, state_ref, rtol=2e-4, atol=2e-4)


def test_chunked_initial_state_continuation():
    """Splitting a sequence in two with state passing == one long scan."""
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(1), L=64)
    y_full, state_full = ssd_chunked(x, dt, A, Bm, Cm, D, chunk_size=16)
    y1, s1 = ssd_chunked(
        x[:, :40], dt[:, :40], A, Bm[:, :40], Cm[:, :40], D, chunk_size=16
    )
    y2, s2 = ssd_chunked(
        x[:, 40:], dt[:, 40:], A, Bm[:, 40:], Cm[:, 40:], D,
        initial_state=s1, chunk_size=16,
    )
    np.testing.assert_allclose(
        jnp.concatenate([y1, y2], axis=1), y_full, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(s2, state_full, rtol=2e-4, atol=2e-4)


def test_ssd_step_matches_scan():
    """Sequential ssd_step over L tokens == full scan."""
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(2), B=1, L=12)
    y_ref, state_ref = ssd_scan_reference(x, dt, A, Bm, Cm, D)
    B, L, H, P = x.shape
    state = jnp.zeros((B, H, P, Bm.shape[-1]), jnp.float32)
    ys = []
    for t in range(L):
        y_t, state = ssd_step(
            x[:, t], dt[:, t], A, Bm[:, t], Cm[:, t], D, state
        )
        ys.append(y_t)
    y_seq = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(y_seq, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(state, state_ref, rtol=1e-5, atol=1e-5)


def test_conv_step_matches_full():
    key = jax.random.PRNGKey(3)
    B, L, C, W = 2, 10, 6, 4
    x = jax.random.normal(key, (B, L, C))
    w = jax.random.normal(jax.random.fold_in(key, 1), (W, C)) * 0.5
    b = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.1
    y_full = causal_conv1d(x, w, b)
    state = jnp.zeros((B, W - 1, C))
    ys = []
    for t in range(L):
        y_t, state = causal_conv1d_step(x[:, t], state, w, b)
        ys.append(y_t)
    np.testing.assert_allclose(jnp.stack(ys, 1), y_full, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        state, conv_state_from_sequence(x, W), rtol=1e-6, atol=1e-6
    )


def test_conv_initial_state_continuation():
    key = jax.random.PRNGKey(4)
    B, L, C, W = 1, 9, 3, 4
    x = jax.random.normal(key, (B, L, C))
    w = jax.random.normal(jax.random.fold_in(key, 1), (W, C)) * 0.5
    y_full = causal_conv1d(x, w, None)
    s = conv_state_from_sequence(x[:, :5], W)
    y2 = causal_conv1d(x[:, 5:], w, None, initial_state=s)
    np.testing.assert_allclose(y2, y_full[:, 5:], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("task", ["t2i", "mmu"])
def test_mamba2_prefill_then_step_matches_full(task):
    """Mixer-level: forward(L) == forward(L1) + steps — the contract the
    decode engine relies on (reference generation.py:239-259)."""
    cfg = Mamba2LayerConfig(
        d_model=32, d_state=16, headdim=8, expand=2, chunk_size=8
    )
    lora_cfg = LoraConfig()
    params = init_mamba2(jax.random.PRNGKey(5), cfg, lora_cfg, n_layer=2)
    # make LoRA B nonzero so the task branch actually matters
    for i, name in enumerate(k for k in params["lora"] if "_B_" in k):
        params["lora"][name] = (
            jax.random.normal(jax.random.PRNGKey(6 + i), params["lora"][name].shape)
            * 0.02
        )
    B, L, L1 = 2, 20, 15
    x = jax.random.normal(jax.random.PRNGKey(8), (B, L, cfg.d_model))

    y_full, _ = mamba2_forward(params, x, task, cfg, lora_cfg, scan_impl="reference")
    y_pre, cache = mamba2_forward(
        params, x[:, :L1], task, cfg, lora_cfg,
        scan_impl="chunked", return_cache=True,
    )
    np.testing.assert_allclose(y_pre, y_full[:, :L1], rtol=1e-4, atol=1e-4)
    ys = []
    for t in range(L1, L):
        y_t, cache = mamba2_step(params, x[:, t], cache, task, cfg, lora_cfg)
        ys.append(y_t)
    y_dec = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(y_dec, y_full[:, L1:], rtol=1e-4, atol=1e-4)


def test_tasks_diverge_with_nonzero_lora():
    cfg = Mamba2LayerConfig(d_model=16, d_state=8, headdim=4, expand=2, chunk_size=8)
    lora_cfg = LoraConfig()
    params = init_mamba2(jax.random.PRNGKey(9), cfg, lora_cfg, n_layer=2)
    params["lora"]["t2i_B_z"] = jnp.ones_like(params["lora"]["t2i_B_z"]) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 6, cfg.d_model))
    y_t2i, _ = mamba2_forward(params, x, "t2i", cfg, lora_cfg)
    y_mmu, _ = mamba2_forward(params, x, "mmu", cfg, lora_cfg)
    assert not np.allclose(np.asarray(y_t2i), np.asarray(y_mmu))


def test_chunked_grads_finite_under_fast_decay():
    """Regression: the intra-chunk decay matrix computed exp(s_i - s_j) at
    masked (j > i) positions too, where the argument is >= 0 and grows with
    the span — overflowing to inf for fast-decaying heads (large dt*|A|).
    The forward where() hid the inf, but the autodiff backward formed
    inf * 0 = NaN (observed on TPU at 1.3B shapes: NaN ddt/dA). The fix
    clamps the masked lanes before the exp."""
    B, L, H, P, N, G = 1, 96, 2, 4, 8, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, H, P)), jnp.float32)
    # dt * |A| ~ 2 per step -> within-chunk span decays by ~190 >> log(f32max)
    dt = jnp.full((B, L, H), 0.5, jnp.float32)
    A = jnp.asarray([-4.0, -8.0], jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, L, G, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, L, G, N)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((H,)), jnp.float32)

    def loss(*a):
        y, st = ssd_chunked(*a, chunk_size=96)
        return jnp.sum(y**2) + jnp.sum(st**2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(
        x, dt, A, Bm, Cm, D
    )
    for name, g in zip(["dx", "ddt", "dA", "dB", "dC", "dD"], grads):
        assert np.isfinite(np.asarray(g)).all(), f"{name} has non-finite entries"

    # and the forward still matches the sequential oracle at these extremes
    y, st = ssd_chunked(x, dt, A, Bm, Cm, D, chunk_size=32)
    y_ref, st_ref = ssd_scan_reference(x, dt, A, Bm, Cm, D)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref), rtol=1e-4, atol=1e-4)
