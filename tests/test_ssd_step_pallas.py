"""Fused decode-step kernel vs the reference ssd_step (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.ops.ssd_reference import ssd_step
from omnimamba_tpu.ops.ssd_step_pallas import ssd_step_pallas


def _inputs(B=4, H=8, P=16, N=32, G=1, state_dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        x_t=jnp.asarray(rng.normal(size=(B, H, P)), jnp.bfloat16),
        dt_t=jnp.asarray(np.abs(rng.normal(size=(B, H))), jnp.float32),
        A=jnp.asarray(-np.abs(rng.normal(size=(H,))), jnp.float32),
        B_t=jnp.asarray(rng.normal(size=(B, G, N)), jnp.bfloat16),
        C_t=jnp.asarray(rng.normal(size=(B, G, N)), jnp.bfloat16),
        D=jnp.asarray(rng.normal(size=(H,)), jnp.float32),
        state=jnp.asarray(rng.normal(size=(B, H, P, N)), state_dtype),
    )


@pytest.mark.parametrize("state_dtype", [jnp.float32, jnp.bfloat16])
def test_matches_reference(state_dtype):
    kw = _inputs(state_dtype=state_dtype)
    y_ref, ns_ref = ssd_step(**kw)
    y_pl, ns_pl = ssd_step_pallas(**kw, head_tile=4, interpret=True)
    assert ns_pl.dtype == state_dtype and y_pl.dtype == kw["x_t"].dtype
    np.testing.assert_allclose(
        np.asarray(ns_pl, np.float32), np.asarray(ns_ref, np.float32),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16 y output
    )


def test_grouped_heads_and_no_D():
    kw = _inputs(H=8, G=2, N=16)
    kw["D"] = None
    y_ref, ns_ref = ssd_step(**kw)
    y_pl, ns_pl = ssd_step_pallas(**kw, head_tile=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ns_pl, np.float32), np.asarray(ns_ref, np.float32),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sequence_of_steps_tracks_reference():
    """8 chained steps: carried-state drift stays at bf16 rounding scale."""
    kw = _inputs(state_dtype=jnp.float32, seed=3)
    s_ref = s_pl = kw.pop("state")
    for t in range(8):
        step_in = _inputs(seed=10 + t)
        step_in.pop("state")
        y_ref, s_ref = ssd_step(**step_in, state=s_ref)
        y_pl, s_pl = ssd_step_pallas(**step_in, state=s_pl, head_tile=4,
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_ref), rtol=1e-3, atol=1e-3
    )
