"""Custom-VJP Pallas SSD backward vs XLA autodiff of the chunked scan."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.ops.ssd_pallas_bwd import ssd_pallas_ad
from tests.test_ssd import _random_ssd_inputs

ARGS = dict(B=2, L=48, H=4, P=8, G=2, N=16)


def _grads(fn, x, dt, A, Bm, Cm, D, wy, wstate):
    def loss(x, dt, A, Bm, Cm, D):
        y, state = fn(x, dt, A, Bm, Cm, D)
        return jnp.sum(y.astype(jnp.float32) * wy) + jnp.sum(state * wstate)

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, Bm, Cm, D)


@pytest.mark.parametrize("Q", [16, 48])
def test_pallas_bwd_matches_autodiff(Q):
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(0), **ARGS)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    wy = jax.random.normal(k1, x.shape)
    wstate = jax.random.normal(k2, (ARGS["B"], ARGS["H"], ARGS["P"], ARGS["N"]))

    ref = _grads(
        functools.partial(ssd_chunked, chunk_size=Q), x, dt, A, Bm, Cm, D, wy, wstate
    )
    got = _grads(
        functools.partial(
            ssd_pallas_ad, chunk_size=Q, head_tile=2, interpret=True
        ),
        x, dt, A, Bm, Cm, D, wy, wstate,
    )
    names = ["dx", "ddt", "dA", "dB", "dC", "dD"]
    for n, r, g in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-3, err_msg=n
        )


def test_pallas_bwd_no_state_cotangent():
    """Loss through y only (the training path)."""
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(2), **ARGS)

    def loss(fn):
        def f(x):
            y, _ = fn(x, dt, A, Bm, Cm, D)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        return jax.grad(f)(x)

    ref = loss(functools.partial(ssd_chunked, chunk_size=16))
    got = loss(
        functools.partial(ssd_pallas_ad, chunk_size=16, head_tile=2, interpret=True)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_pallas_ad_forward_matches():
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(3), **ARGS)
    y1, s1 = ssd_chunked(x, dt, A, Bm, Cm, D, chunk_size=16)
    y2, s2 = ssd_pallas_ad(x, dt, A, Bm, Cm, D, 16, 2, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=2e-4, atol=2e-4)


def test_pallas_bwd_bf16_inputs():
    """bf16 inputs take the mxu_dtype=bf16 kernel path (folded bf16
    operands + the hi/lo suffix-dot split) — grads must track the fp32
    chunked-autodiff oracle at bf16 tolerance."""
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(3), **ARGS)
    xb = x.astype(jnp.bfloat16)
    Bb = Bm.astype(jnp.bfloat16)
    Cb = Cm.astype(jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    wy = jax.random.normal(k1, x.shape)
    wstate = jax.random.normal(k2, (ARGS["B"], ARGS["H"], ARGS["P"], ARGS["N"]))

    ref = _grads(
        functools.partial(ssd_chunked, chunk_size=16), x, dt, A, Bm, Cm, D,
        wy, wstate,
    )
    got = _grads(
        functools.partial(ssd_pallas_ad, chunk_size=16, head_tile=2,
                          interpret=True),
        xb, dt, A, Bb, Cb, D, wy, wstate,
    )
    names = ["dx", "ddt", "dA", "dB", "dC", "dD"]
    for n, r, g in zip(names, ref, got):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        scale = max(np.abs(r).max(), 1e-6)
        assert np.abs(g - r).max() / scale < 6e-2, (
            n, float(np.abs(g - r).max() / scale)
        )


@pytest.mark.parametrize("L", [48, 300])
def test_pallas_bwd_subtiled_q256(L):
    """Q=256 triggers the 128-wide sub-tile decomposition (upper tiles
    dropped, off-diagonal decay factored at the source-tile boundary) —
    grads must match the monolithic math exactly up to fp tolerance."""
    args = dict(ARGS, L=L)
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(5), **args)
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    wy = jax.random.normal(k1, x.shape)
    wstate = jax.random.normal(k2, (args["B"], args["H"], args["P"], args["N"]))

    ref = _grads(
        functools.partial(ssd_chunked, chunk_size=256), x, dt, A, Bm, Cm, D,
        wy, wstate,
    )
    got = _grads(
        functools.partial(ssd_pallas_ad, chunk_size=256, head_tile=2,
                          interpret=True),
        x, dt, A, Bm, Cm, D, wy, wstate,
    )
    for n, r, g in zip(["dx", "ddt", "dA", "dB", "dC", "dD"], ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-3, err_msg=n
        )


def test_pallas_bwd_rejects_group_spanning_head_tile():
    """An explicit head_tile that doesn't divide heads-per-group would make
    a tile read the wrong B/C group (silent wrong grads) — must raise."""
    args = dict(ARGS, H=2)  # G=2 -> rep=1; head_tile=2 spans groups
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(9), **args)

    def loss(x):
        y, _ = ssd_pallas_ad(x, dt, A, Bm, Cm, D, 16, 2, True)
        return jnp.sum(jnp.square(y))

    with pytest.raises(ValueError, match="heads-per-group"):
        jax.grad(loss)(x)


def test_pallas_bwd_subtiled_q384():
    """Q=384 (the production chunk pick) is the first odd tile count
    (nt=3): distance-2 off-diagonal tiles and a non-final diagonal tile
    both appear, neither of which Q=256 exercises."""
    args = dict(ARGS, B=1, L=768, H=2, G=1)
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(7), **args)
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    wy = jax.random.normal(k1, x.shape)
    wstate = jax.random.normal(k2, (args["B"], args["H"], args["P"], args["N"]))

    ref = _grads(
        functools.partial(ssd_chunked, chunk_size=384), x, dt, A, Bm, Cm, D,
        wy, wstate,
    )
    got = _grads(
        functools.partial(ssd_pallas_ad, chunk_size=384, head_tile=2,
                          interpret=True),
        x, dt, A, Bm, Cm, D, wy, wstate,
    )
    for n, r, g in zip(["dx", "ddt", "dA", "dB", "dC", "dD"], ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-3, err_msg=n
        )
