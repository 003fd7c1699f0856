"""Vision->LLM projection adapters.

Reference: ``models/cobra/nn_utils.py:13-128``. The shipped config uses
``FusedMLPProjector`` (2176 -> 4*2176 -> d_model -> d_model with GELU,
``omnimamba.py:71``); linear and gelu-mlp variants are kept for parity with
the ``arch_specifier`` switch (``omnimamba.py:66-77``). The arch is a static
argument (not stored in the pytree) so params stay pure-array.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def _linear(key, d_in, d_out, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(d_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (d_in, d_out), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (d_out,), dtype, -bound, bound),
    }


def _apply(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def canonical_arch(arch: str) -> str:
    if arch == "linear":
        return "linear"
    if arch.endswith("fused-gelu-mlp"):
        return "fused-gelu-mlp"
    if arch.endswith("gelu-mlp"):
        return "gelu-mlp"
    if arch.endswith("fused-ldpnet"):
        return "fused-ldpnet"
    if arch.endswith("ldpnet"):
        return "ldpnet"
    raise ValueError(f"unsupported projector arch {arch}")


def _token_down(x, out_hw=14):
    """TokenDownLayer (nn_utils.py:58-72): adaptive avg-pool a square token
    grid to (out_hw, out_hw)."""
    import math as _math

    B, T, C = x.shape
    h = int(_math.isqrt(T))
    assert h * h == T
    g = x.reshape(B, h, h, C)
    # adaptive pooling == resize-average when h % out_hw == 0; otherwise use
    # area-style interpolation via jax.image
    if h % out_hw == 0:
        k = h // out_hw
        g = g.reshape(B, out_hw, k, out_hw, k, C).mean(axis=(2, 4))
    else:
        g = jax.image.resize(g, (B, out_hw, out_hw, C), method="linear")
    return g.reshape(B, out_hw * out_hw, C)


def _pos_inject(p, x):
    """PosInjectLayer (nn_utils.py:75-90): 3x3 depthwise conv + residual."""
    import math as _math

    B, T, C = x.shape
    h = int(_math.isqrt(T))
    g = x.reshape(B, h, h, C)
    y = jax.lax.conv_general_dilated(
        g, p["peg"]["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=jnp.float32,
    )
    y = (y + p["peg"]["bias"].astype(jnp.float32)).astype(x.dtype) + g
    return y.reshape(B, T, C)


def init_projector(
    key: jax.Array,
    vision_dim: int,
    llm_dim: int,
    arch: str = "fused-gelu-mlp",
    dtype=jnp.float32,
) -> Dict:
    ks = jax.random.split(key, 3)
    arch = canonical_arch(arch)
    if arch == "linear":
        return {"fc1": _linear(ks[0], vision_dim, llm_dim, dtype)}
    if arch == "fused-gelu-mlp":
        hidden = vision_dim * 4
        return {
            "fc1": _linear(ks[0], vision_dim, hidden, dtype),
            "fc2": _linear(ks[1], hidden, llm_dim, dtype),
            "fc3": _linear(ks[2], llm_dim, llm_dim, dtype),
        }
    if arch in ("ldpnet", "fused-ldpnet"):
        import math as _math

        hidden = vision_dim * 4 if arch == "fused-ldpnet" else llm_dim
        bound = 1.0 / _math.sqrt(9)  # depthwise 3x3
        kk = jax.random.split(ks[2], 2)
        p = {
            "fc1": _linear(ks[0], vision_dim, hidden, dtype),
            "fc2": _linear(ks[1], hidden, llm_dim, dtype),
            "peg": {
                "kernel": jax.random.uniform(kk[0], (3, 3, 1, llm_dim), dtype, -bound, bound),
                "bias": jax.random.uniform(kk[1], (llm_dim,), dtype, -bound, bound),
            },
        }
        return p
    return {
        "fc1": _linear(ks[0], vision_dim, llm_dim, dtype),
        "fc2": _linear(ks[1], llm_dim, llm_dim, dtype),
    }


def apply_projector(params: Dict, x: jax.Array, arch: str = "fused-gelu-mlp") -> jax.Array:
    arch = canonical_arch(arch)
    if arch == "linear":
        return _apply(params["fc1"], x)
    if arch == "fused-gelu-mlp":
        h = jax.nn.gelu(_apply(params["fc1"], x), approximate=False)
        h = jax.nn.gelu(_apply(params["fc2"], h), approximate=False)
        return _apply(params["fc3"], h)
    if arch in ("ldpnet", "fused-ldpnet"):
        h = jax.nn.gelu(_apply(params["fc1"], x), approximate=False)
        h = _apply(params["fc2"], h)
        h = _token_down(h)
        return _pos_inject(params, h)
    h = jax.nn.gelu(_apply(params["fc1"], x), approximate=False)
    return _apply(params["fc2"], h)
