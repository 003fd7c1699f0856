"""Device mesh over ICI — the TPU-native replacement for the reference's
NCCL/DDP world (SURVEY §5.8: DDP all-reduce was the sole collective there).

Axes:
    dp    data parallel (batch dim; gradient psum — the reference's only
          strategy, 8-way DDP via accelerate, config_stage2.yaml:2-7)
    fsdp  parameter sharding along a large axis, all-gathered by XLA on use
          (ZeRO-3 analog; the reference ships dormant DeepSpeed paths,
          mixer_seq_simple.py:586-592)
    tp    tensor parallel over Mamba-2 heads (see models/mamba2.py layout)

The mesh maps dp outermost so gradient all-reduces ride the widest rings;
fsdp/tp innermost so their all-gathers/psums stay on neighbouring chips.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def create_mesh(
    shape: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """shape e.g. {"dp": 2, "tp": 4}; unmentioned canonical axes get size 1.
    With no shape, all devices go to dp (the reference's DDP topology).
    Extra axes (e.g. {"sp": 8} for sequence-parallel prefill) are appended
    after the canonical three in the given order."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = dict(shape or {})
    axes = list(AXES) + [ax for ax in shape if ax not in AXES]
    sizes = [shape.get(ax, 1) for ax in axes]
    specified = int(np.prod([s for s in sizes if s > 0]))
    # fill an absent dp with the remainder
    if "dp" not in shape and specified < n and n % specified == 0:
        sizes[0] = n // specified
        specified = n
    assert specified == n, f"mesh {dict(zip(axes, sizes))} != {n} devices"
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(axes))


def local_mesh_1d(n: Optional[int] = None) -> Mesh:
    """Convenience 1-D dp mesh over the first n devices."""
    devs = jax.devices()[: n or len(jax.devices())]
    return Mesh(np.asarray(devs), ("dp",))
