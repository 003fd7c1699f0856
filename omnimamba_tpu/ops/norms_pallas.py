"""Fused add+RMSNorm as a Pallas kernel with a custom VJP.

The reference rides Triton ``layer_norm_fn`` for this exact fusion
(``models/stage2/block.py:86-95``). The jnp version (ops/norms.add_norm) is
semantically identical but XLA schedules the training backward as several
separate passes over the (B, L, d) activations — the r3 step trace measured
~33 ms/step of norm work at 1.3B B=8 against a ~13 ms read+write floor
(bf16 activations + fp32 residual stream). This kernel does the fwd in one
pass and the bwd in one pass + a tiny dw accumulation.

Memory contract: the fwd returns (normed, y) where y = x + residual in
fp32 — y IS the block's residual stream, so saving it as the VJP residual
costs nothing beyond what the model already carries. rstd is recomputed in
the backward from y (one in-VMEM reduction) instead of being stored.

Backward math (per row; y32 = x + res, rstd = (mean(y²)+eps)^-1/2,
out = y*rstd*w, g = dout):
    dy = w∘g·rstd − y · rstd³/d · Σ_d(w∘g∘y) + dres
    dx = dy (cast to x.dtype);  dres_in = dy (fp32);  dw = Σ_rows g∘y·rstd
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, res_ref, w_ref, out_ref, y_ref, *, eps, d, has_res):
    x = x_ref[...].astype(jnp.float32)
    y = x + res_ref[...] if has_res else x
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    w = w_ref[...].astype(jnp.float32)
    out_ref[...] = (y * rstd * w).astype(out_ref.dtype)
    y_ref[...] = y


def _bwd_kernel(
    y_ref, g_ref, w_ref, dres_ref, dx_ref, dy_ref, dw_ref, *, eps, d, has_dres
):
    y = y_ref[...]  # (R, d) fp32
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    wg = w * g
    dot = jnp.sum(wg * y, axis=-1, keepdims=True)  # (R, 1)
    dy = wg * rstd - y * (rstd * rstd * rstd / d) * dot
    if has_dres:
        dy = dy + dres_ref[...]
    dy_ref[...] = dy
    dx_ref[...] = dy.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] = dw_ref[...] + jnp.sum(g * y * rstd, axis=0, keepdims=True)


def _row_tile(rows: int, d: int) -> int:
    # ~0.75 MB fp32 working blocks. The backward streams 5 row-blocks
    # (y, g, dres, dx, dy), each double-buffered by the Pallas pipeline —
    # at 2 MB blocks that is ~19.7 MB scoped VMEM, over the 16 MB limit
    # (measured OOM at 1.3B B=8 L=329 train step, r5). 0.75 MB keeps the
    # worst case ~7 MB with headroom for the (1, d) operands.
    r = max(8, min(512, (3 * 1024 * 1024 // 4) // (4 * d) // 8 * 8))
    return min(r, rows)


def _pad_rows(a: jax.Array, rp: int) -> jax.Array:
    return a if a.shape[0] == rp else jnp.pad(a, ((0, rp - a.shape[0]), (0, 0)))


def fused_add_rms_norm(
    x: jax.Array,
    residual: Optional[jax.Array],
    weight: jax.Array,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas fused (x + residual) -> RMSNorm; returns (normed, y_fp32).

    Matches ops/norms.add_norm(..., is_rms=True, residual_in_fp32=True,
    prenorm=True) numerics: y accumulates in fp32, statistics in fp32,
    normed cast back to x.dtype. ``residual=None`` is the first block.
    """
    if residual is None:
        return _fused_nores(x, weight, eps, interpret)
    return _fused_res(x, residual, weight, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_res(x, residual, weight, eps, interpret):
    return _fwd_impl(x, residual, weight, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_nores(x, weight, eps, interpret):
    return _fwd_impl(x, None, weight, eps, interpret)


def _interp(interpret):
    return interpret if interpret is not None else jax.default_backend() != "tpu"


def _fwd_impl(x, residual, weight, eps, interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    rows = x2.shape[0]
    R = _row_tile(rows, d)
    rp = -(-rows // R) * R
    x2 = _pad_rows(x2, rp)
    has_res = residual is not None
    res2 = (
        _pad_rows(residual.astype(jnp.float32).reshape(-1, d), rp)
        if has_res
        else jnp.zeros((1, d), jnp.float32)  # placeholder, not read
    )
    grid = (rp // R,)
    row_spec = pl.BlockSpec((R, d), lambda i: (i, 0))
    res_spec = row_spec if has_res else pl.BlockSpec((1, d), lambda i: (0, 0))
    out, y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, d=d, has_res=has_res),
        grid=grid,
        in_specs=[row_spec, res_spec, pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rp, d), x.dtype),
            jax.ShapeDtypeStruct((rp, d), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(x2, res2, weight.reshape(1, d))
    return (
        out[:rows].reshape(orig_shape),
        y[:rows].reshape(orig_shape),
    )


def _vjp_fwd_res(x, residual, weight, eps, interpret):
    # symbolic_zeros=True (needed so _bwd_shared ever SEES a SymbolicZero
    # dres) wraps each diff primal in a CustomVJPPrimal
    x, residual, weight = x.value, residual.value, weight.value
    out, y = _fwd_impl(x, residual, weight, eps, interpret)
    # y is the model's own residual stream: pinning it as the VJP residual
    # adds no HBM beyond what the block carries anyway
    return (out, y), (y, weight)


def _vjp_fwd_nores(x, weight, eps, interpret):
    x, weight = x.value, weight.value
    out, y = _fwd_impl(x, None, weight, eps, interpret)
    return (out, y), (y, weight)


def _vjp_bwd_res(eps, interpret, res, cts):
    dx, dres_in, dw = _bwd_shared(eps, interpret, res, cts, has_res=True)
    return dx, dres_in, dw


def _vjp_bwd_nores(eps, interpret, res, cts):
    dx, _, dw = _bwd_shared(eps, interpret, res, cts, has_res=False)
    return dx, dw


def _bwd_shared(eps, interpret, res, cts, *, has_res):
    y, weight = res
    g, dres = cts  # cotangents of (normed, y); g.dtype == x.dtype
    if isinstance(g, jax.custom_derivatives.SymbolicZero):
        # normed output unused downstream (rare — e.g. a probe on the
        # residual stream only); materialize and take the normal path
        g = jnp.zeros(g.shape, g.dtype)
    x_dtype = g.dtype
    orig_shape = y.shape
    d = orig_shape[-1]
    y2 = y.reshape(-1, d)
    rows = y2.shape[0]
    R = _row_tile(rows, d)
    rp = -(-rows // R) * R
    y2 = _pad_rows(y2, rp)
    g2 = _pad_rows(g.reshape(-1, d), rp)
    # the residual-stream cotangent may be a symbolic zero
    has_dres = dres is not None and not isinstance(
        dres, jax.custom_derivatives.SymbolicZero
    )
    dres2 = (
        _pad_rows(dres.astype(jnp.float32).reshape(-1, d), rp)
        if has_dres
        else jnp.zeros((1, d), jnp.float32)
    )
    grid = (rp // R,)
    row_spec = pl.BlockSpec((R, d), lambda i: (i, 0))
    dres_spec = row_spec if has_dres else pl.BlockSpec((1, d), lambda i: (0, 0))
    dx, dy, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, d=d, has_dres=has_dres),
        grid=grid,
        in_specs=[row_spec, row_spec, pl.BlockSpec((1, d), lambda i: (0, 0)),
                  dres_spec],
        out_specs=[row_spec, row_spec, pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((rp, d), x_dtype),
            jax.ShapeDtypeStruct((rp, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(y2, g2, weight.reshape(1, d), dres2)
    dx = dx[:rows].reshape(orig_shape)
    dy_res = dy[:rows].reshape(orig_shape) if has_res else None
    return dx, dy_res, dw.reshape(weight.shape).astype(weight.dtype)


_fused_res.defvjp(_vjp_fwd_res, _vjp_bwd_res, symbolic_zeros=True)
_fused_nores.defvjp(_vjp_fwd_nores, _vjp_bwd_nores, symbolic_zeros=True)


# ---------------------------------------------------------------------------
# Gated RMSNorm (Mamba-2's RMSNormGated, norm_before_gate=False):
#   out = RMSNorm(y * silu(z)) * w    on the (B, L, d_inner) mixer stream
# ---------------------------------------------------------------------------


def _gated_fwd_kernel(y_ref, z_ref, w_ref, out_ref, *, eps, d):
    y = y_ref[...].astype(jnp.float32)
    z = z_ref[...].astype(jnp.float32)
    u = y * (z * jax.nn.sigmoid(z))
    var = jnp.mean(u * u, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    out_ref[...] = (u * rstd * w_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _gated_bwd_kernel(y_ref, z_ref, g_ref, w_ref, dy_ref, dz_ref, dw_ref, *, eps, d):
    y = y_ref[...].astype(jnp.float32)
    z = z_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    sz = jax.nn.sigmoid(z)
    silu = z * sz
    u = y * silu
    var = jnp.mean(u * u, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    wg = w * g
    dot = jnp.sum(wg * u, axis=-1, keepdims=True)
    du = wg * rstd - u * (rstd * rstd * rstd / d) * dot
    dy_ref[...] = (du * silu).astype(dy_ref.dtype)
    # d silu(z)/dz = sigmoid(z) * (1 + z * (1 - sigmoid(z)))
    dz_ref[...] = (du * y * (sz * (1.0 + z * (1.0 - sz)))).astype(dz_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] = dw_ref[...] + jnp.sum(g * u * rstd, axis=0, keepdims=True)


def fused_gated_rms_norm(
    y: jax.Array, z: jax.Array, weight: jax.Array,
    eps: float = 1e-5, interpret: Optional[bool] = None,
) -> jax.Array:
    """Pallas RMSNorm(y * silu(z)) * weight; numerics of norms.gated_rms_norm."""
    return _fused_gated(y, z, weight, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_gated(y, z, weight, eps, interpret):
    orig_shape = y.shape
    d = orig_shape[-1]
    y2 = y.reshape(-1, d)
    rows = y2.shape[0]
    R = _row_tile(rows, d)
    rp = -(-rows // R) * R
    y2 = _pad_rows(y2, rp)
    z2 = _pad_rows(z.reshape(-1, d), rp)
    row_spec = pl.BlockSpec((R, d), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_gated_fwd_kernel, eps=eps, d=d),
        grid=(rp // R,),
        in_specs=[row_spec, row_spec, pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rp, d), y.dtype),
        interpret=_interp(interpret),
    )(y2, z2, weight.reshape(1, d))
    return out[:rows].reshape(orig_shape)


def _gated_vjp_fwd(y, z, weight, eps, interpret):
    return _fused_gated(y, z, weight, eps, interpret), (y, z, weight)


def _gated_vjp_bwd(eps, interpret, res, g):
    y, z, weight = res
    orig_shape = y.shape
    d = orig_shape[-1]
    y2 = y.reshape(-1, d)
    rows = y2.shape[0]
    R = _row_tile(rows, d)
    rp = -(-rows // R) * R
    y2 = _pad_rows(y2, rp)
    z2 = _pad_rows(z.reshape(-1, d), rp)
    g2 = _pad_rows(g.reshape(-1, d), rp)
    row_spec = pl.BlockSpec((R, d), lambda i: (i, 0))
    dy, dz, dw = pl.pallas_call(
        functools.partial(_gated_bwd_kernel, eps=eps, d=d),
        grid=(rp // R,),
        in_specs=[row_spec, row_spec, row_spec,
                  pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=[row_spec, row_spec, pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((rp, d), y.dtype),
            jax.ShapeDtypeStruct((rp, d), z.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(y2, z2, g2, weight.reshape(1, d))
    return (
        dy[:rows].reshape(orig_shape),
        dz[:rows].reshape(orig_shape),
        dw.reshape(weight.shape).astype(weight.dtype),
    )


_fused_gated.defvjp(_gated_vjp_fwd, _gated_vjp_bwd)
