"""Tracing / profiling utilities (SURVEY §5.1).

The reference's observability is minimal (an unused torch.profiler import
and opt-in CUDA-event decode timing, generation.py:231-263). The TPU-native
equivalents here:

- ``trace(path)``: jax.profiler context producing a TensorBoard/Perfetto
  trace of everything inside;
- ``Timer`` / ``device_time``: wall-clock timing with a *host-visible* sync
  (``jax.block_until_ready`` can return early on the experimental axon
  tunnel platform, so timing forces a scalar device->host fetch);
- ``bench_compiled``: device-side loop timing for micro-benchmarks — a
  single host sync through the tunnel costs ~30 ms, so per-op timing must
  amortize over K on-device iterations.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np


def hard_sync(x) -> None:
    """Force completion by materializing one scalar on the host."""
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0].ravel()[-1])


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Phase timer with hard device sync (the reference's enable_timing
    analog, generation.py:231-263)."""

    def __init__(self, name: str = "", log_fn: Optional[Callable] = None):
        self.name = name
        self.log_fn = log_fn
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.log_fn:
            self.log_fn(f"{self.name}: {self.elapsed * 1e3:.1f} ms")
        return False


def device_time(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> float:
    """Best-of wall time of fn(*args) with hard syncs. Suitable only for
    calls >> 30 ms (tunnel RTT); use bench_compiled below for smaller ops."""
    for _ in range(warmup):
        hard_sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_compiled(fn: Callable, *args, loops: int = 50) -> float:
    """Seconds per call, measured by looping the op on-device inside one jit
    (serialized via a scalar data dependency) and syncing once."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(*a):
        def body(i, acc):
            # thread the carry into every floating input: without this,
            # XLA's loop-invariant code motion hoists pure-XLA bodies out
            # of the loop and the "benchmark" measures one evaluation
            # (Pallas custom calls are not hoisted, XLA ops are)
            eps = acc * 1e-30
            a2 = jax.tree.map(
                lambda t: t + eps.astype(t.dtype)
                if jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating)
                else t,
                a,
            )
            out = fn(*a2)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.ravel()[-1].astype(jnp.float32)

        return jax.lax.fori_loop(0, loops, body, jnp.float32(0.0))

    hard_sync(many(*args))
    t0 = time.perf_counter()
    hard_sync(many(*args))
    return (time.perf_counter() - t0) / loops
