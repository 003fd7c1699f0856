"""Pallas fused add+RMSNorm vs the jnp reference (ops/norms.add_norm):
forward values AND all gradients must match, with and without an incoming
residual, bf16 and fp32 activations, non-tile-aligned row counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.ops.norms import add_norm
from omnimamba_tpu.ops.norms_pallas import fused_add_rms_norm


def _ref(x, res, w, eps=1e-5):
    return add_norm(x, res, w, eps=eps, is_rms=True,
                    residual_in_fp32=True, prenorm=True)


@pytest.mark.parametrize("with_res", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_add_rms_norm_fwd_bwd(with_res, dtype):
    rng = np.random.default_rng(0)
    B, L, d = 2, 13, 256  # 26 rows: exercises row padding
    x = jnp.asarray(rng.standard_normal((B, L, d)), dtype)
    res = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32) if with_res else None
    w = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)

    out_p, y_p = jax.jit(
        lambda *a: fused_add_rms_norm(*a, 1e-5, True)
    )(x, res, w)
    out_r, y_r = _ref(x, res, w)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), rtol=1e-6, atol=1e-6)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_r, np.float32),
        rtol=tol, atol=tol,
    )

    # downstream uses BOTH outputs (normed feeds the mixer, y is the
    # residual stream) — grads must match through both paths
    def loss_p(x, w, res):
        o, y = fused_add_rms_norm(x, res, w, 1e-5, True)
        return jnp.sum(jnp.square(o.astype(jnp.float32))) + jnp.sum(y * y * 0.5)

    def loss_r(x, w, res):
        o, y = _ref(x, res, w)
        return jnp.sum(jnp.square(o.astype(jnp.float32))) + jnp.sum(y * y * 0.5)

    args = (x, w, res) if with_res else (x, w, None)
    argnums = (0, 1, 2) if with_res else (0, 1)
    gp = jax.jit(jax.grad(loss_p, argnums=argnums))(*args)
    gr = jax.jit(jax.grad(loss_r, argnums=argnums))(*args)
    names = ["dx", "dw", "dres"][: len(argnums)]
    for a, b, n in zip(gp, gr, names):
        atol = 1e-4 if dtype == jnp.float32 else 0.15
        scale = max(float(jnp.max(jnp.abs(b.astype(jnp.float32)))), 1e-6)
        err = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        ) / scale
        assert err < (1e-4 if dtype == jnp.float32 else 2e-2), (n, err)


def test_env_switch_routes_add_norm(monkeypatch):
    import omnimamba_tpu.ops.norms as norms

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 200, 128)), jnp.float32)
    w = jnp.ones((128,), jnp.float32)
    ref_out, ref_y = norms.add_norm(x, None, w)
    monkeypatch.setattr(norms, "_PALLAS_NORM", True)
    out, y = norms.add_norm(x, None, w)
    # small decode-step shapes must stay on the XLA path (kernel-launch
    # latency loses at one token per step)
    assert not norms._pallas_worthwhile(x[:, :1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_gated_rms_norm_fwd_bwd(dtype):
    from omnimamba_tpu.ops.norms import gated_rms_norm
    from omnimamba_tpu.ops.norms_pallas import fused_gated_rms_norm

    rng = np.random.default_rng(2)
    B, L, d = 2, 11, 256
    y = jnp.asarray(rng.standard_normal((B, L, d)), dtype)
    z = jnp.asarray(rng.standard_normal((B, L, d)), dtype)
    w = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)

    out_p = jax.jit(lambda *a: fused_gated_rms_norm(*a, 1e-5, True))(y, z, w)
    out_r = gated_rms_norm(y, z, w)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_r, np.float32),
        rtol=tol, atol=tol,
    )

    def loss(f):
        return lambda y, z, w: jnp.sum(
            jnp.square(f(y, z, w).astype(jnp.float32))
        )

    gp = jax.jit(jax.grad(
        loss(lambda y, z, w: fused_gated_rms_norm(y, z, w, 1e-5, True)),
        argnums=(0, 1, 2)))(y, z, w)
    gr = jax.jit(jax.grad(loss(gated_rms_norm), argnums=(0, 1, 2)))(y, z, w)
    for a, b, n in zip(gp, gr, ["dy", "dz", "dw"]):
        scale = max(float(jnp.max(jnp.abs(b.astype(jnp.float32)))), 1e-6)
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))) / scale
        assert err < (1e-4 if dtype == jnp.float32 else 2e-2), (n, err)


def test_fused_norm_symbolic_zero_dres_path():
    """Loss through the normed output only (the common training shape when
    the residual stream's cotangent is structurally zero): with
    symbolic_zeros=True the backward must take the has_dres=False fast
    path — no padded zeros block streamed — and still match the reference
    gradients exactly."""
    rng = np.random.default_rng(1)
    B, L, d = 2, 13, 256
    x = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    w = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)

    def loss_p(x, res, w):
        o, _ = fused_add_rms_norm(x, res, w, 1e-5, True)
        return jnp.sum(jnp.square(o))

    def loss_r(x, res, w):
        o, _ = _ref(x, res, w)
        return jnp.sum(jnp.square(o))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, res, w)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, res, w)
    for a, b, n in zip(gp, gr, ["dx", "dres", "dw"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=n
        )
