"""Mamba-1 mixer — the ``ssm_cfg={'layer': 'Mamba1'}`` option.

Reference: ``mamba_ssm.modules.mamba_simple.Mamba`` (CUDA selective_scan),
selectable per config (mixer_seq_simple.py:196-205) but unused by every
shipped OmniMamba config (SURVEY §2.3 row 2). Provided for config parity.

Unlike Mamba-2's scalar-decay heads, Mamba-1 keeps a per-channel (d_inner)
x per-state (N) decay:

    h_t = exp(dt ⊙ A) ⊙ h_{t-1} + (dt ⊙ B_t) x_t      h: (d_inner, N)
    y_t = h_t · C_t + D ⊙ x_t ;  out = out_proj(y ⊙ silu(z))

The parallel form uses ``jax.lax.associative_scan`` over the linear
recurrence (first-order elements (a, b), combine (a2 a1, a2 b1 + b2)) —
O(log L) depth, fp32 state. The O(1) ``mamba1_step`` mirrors
``selective_state_update``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omnimamba_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_step,
    conv_state_from_sequence,
)


@dataclass(frozen=True)
class Mamba1LayerConfig:
    d_model: int = 2048
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def dt_rank(self) -> int:
        return math.ceil(self.d_model / 16)


class Mamba1Cache(NamedTuple):
    conv_state: jax.Array  # (B, W-1, d_inner)
    ssm_state: jax.Array  # (B, d_inner, N) fp32


def init_mamba1(
    key: jax.Array, cfg: Mamba1LayerConfig, n_layer: int, dtype=jnp.float32
) -> Dict:
    k = jax.random.split(key, 8)
    d, di, N = cfg.d_model, cfg.d_inner, cfg.d_state
    bd = 1.0 / math.sqrt(d)
    bi = 1.0 / math.sqrt(di)
    br = 1.0 / math.sqrt(cfg.dt_rank)
    bc = 1.0 / math.sqrt(cfg.d_conv)

    # dt_proj bias init (mamba_simple: softplus^-1 of exp-uniform dt)
    u = jax.random.uniform(k[0], (di,), jnp.float32)
    dt = jnp.exp(u * (math.log(cfg.dt_max) - math.log(cfg.dt_min)) + math.log(cfg.dt_min))
    dt = jnp.maximum(dt, cfg.dt_init_floor)
    dt_bias = dt + jnp.log(-jnp.expm1(-dt))

    # A_log: log(1..N) per channel (S4D-real init)
    A_log = jnp.log(jnp.broadcast_to(jnp.arange(1, N + 1, dtype=jnp.float32), (di, N)))

    return {
        "in_proj": {
            "kernel": jax.random.uniform(k[1], (d, 2 * di), dtype, -bd, bd)
        },
        "conv": {
            "weight": jax.random.uniform(k[2], (cfg.d_conv, di), dtype, -bc, bc),
            "bias": jax.random.uniform(k[3], (di,), dtype, -bc, bc),
        },
        "x_proj": {
            "kernel": jax.random.uniform(
                k[4], (di, cfg.dt_rank + 2 * N), dtype, -bi, bi
            )
        },
        "dt_proj": {
            "kernel": jax.random.uniform(k[5], (cfg.dt_rank, di), dtype, -br, br),
            "bias": dt_bias.astype(dtype),
        },
        "A_log": A_log.astype(dtype),
        "D": jnp.ones((di,), dtype),
        "out_proj": {
            "kernel": jax.random.uniform(k[6], (di, d), dtype, -bi, bi)
            / math.sqrt(n_layer)
        },
    }


def _ssm_inputs(params: Dict, xs: jax.Array, cfg: Mamba1LayerConfig):
    """x_proj -> (dt (…,di) softplus'ed, B (…,N), C (…,N))."""
    N = cfg.d_state
    dbc = xs @ params["x_proj"]["kernel"].astype(xs.dtype)
    dt_r = dbc[..., : cfg.dt_rank]
    Bm = dbc[..., cfg.dt_rank : cfg.dt_rank + N].astype(jnp.float32)
    Cm = dbc[..., cfg.dt_rank + N :].astype(jnp.float32)
    dt = dt_r @ params["dt_proj"]["kernel"].astype(dt_r.dtype)
    dt = jax.nn.softplus(
        dt.astype(jnp.float32) + params["dt_proj"]["bias"].astype(jnp.float32)
    )
    return dt, Bm, Cm


def selective_scan(
    xs: jax.Array,  # (B, L, di) fp32-castable
    dt: jax.Array,  # (B, L, di) fp32
    A: jax.Array,  # (di, N) negative
    Bm: jax.Array,  # (B, L, N)
    Cm: jax.Array,  # (B, L, N)
    D: Optional[jax.Array],  # (di,)
    *,
    initial_state: Optional[jax.Array] = None,  # (B, di, N)
) -> Tuple[jax.Array, jax.Array]:
    """Parallel selective scan via associative_scan. Returns (y, final_h)."""
    xf = xs.astype(jnp.float32)
    a = jnp.exp(dt[..., None] * A[None, None])  # (B, L, di, N)
    b = (dt * xf)[..., None] * Bm[:, :, None, :]  # (B, L, di, N)
    if initial_state is not None:
        # fold h0 into the first step: b_0 += a_0 * h0
        b = b.at[:, 0].add(a[:, 0] * initial_state.astype(jnp.float32))

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, Cm, preferred_element_type=jnp.float32)
    if D is not None:
        y = y + xf * D.astype(jnp.float32)
    return y.astype(xs.dtype), h[:, -1]


def mamba1_forward(
    params: Dict,
    x: jax.Array,  # (B, L, d_model)
    cfg: Mamba1LayerConfig,
    *,
    return_cache: bool = False,
) -> Tuple[jax.Array, Optional[Mamba1Cache]]:
    di = cfg.d_inner
    xz = x @ params["in_proj"]["kernel"].astype(x.dtype)
    xs_raw, z = xz[..., :di], xz[..., di:]
    xs = causal_conv1d(xs_raw, params["conv"]["weight"], params["conv"]["bias"])
    dt, Bm, Cm = _ssm_inputs(params, xs, cfg)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y, final_h = selective_scan(xs, dt, A, Bm, Cm, params["D"])
    y = y * jax.nn.silu(z.astype(jnp.float32)).astype(y.dtype)
    out = y @ params["out_proj"]["kernel"].astype(y.dtype)
    cache = None
    if return_cache:
        cache = Mamba1Cache(
            conv_state=conv_state_from_sequence(xs_raw, cfg.d_conv),
            ssm_state=final_h,
        )
    return out, cache


def init_mamba1_cache(batch: int, cfg: Mamba1LayerConfig, dtype=jnp.bfloat16) -> Mamba1Cache:
    return Mamba1Cache(
        conv_state=jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner), dtype),
        ssm_state=jnp.zeros((batch, cfg.d_inner, cfg.d_state), jnp.float32),
    )


def mamba1_step(
    params: Dict,
    x_t: jax.Array,  # (B, d_model)
    cache: Mamba1Cache,
    cfg: Mamba1LayerConfig,
) -> Tuple[jax.Array, Mamba1Cache]:
    di = cfg.d_inner
    xz = x_t @ params["in_proj"]["kernel"].astype(x_t.dtype)
    xs_raw, z = xz[..., :di], xz[..., di:]
    xs, new_conv = causal_conv1d_step(
        xs_raw, cache.conv_state, params["conv"]["weight"], params["conv"]["bias"]
    )
    dt, Bm, Cm = _ssm_inputs(params, xs, cfg)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    a = jnp.exp(dt[..., None] * A[None])  # (B, di, N)
    b = (dt * xs.astype(jnp.float32))[..., None] * Bm[:, None, :]
    h = cache.ssm_state.astype(jnp.float32) * a + b
    y = jnp.einsum("bdn,bn->bd", h, Cm, preferred_element_type=jnp.float32)
    y = y + xs.astype(jnp.float32) * params["D"].astype(jnp.float32)
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(x_t.dtype)
    out = y @ params["out_proj"]["kernel"].astype(y.dtype)
    return out, Mamba1Cache(conv_state=new_conv, ssm_state=h.astype(cache.ssm_state.dtype))
