"""Profiling utilities: trace context writes artifacts; timers behave."""

import os

import jax.numpy as jnp

from omnimamba_tpu.utils.profiling import Timer, bench_compiled, device_time, hard_sync, trace


def test_trace_writes_artifacts(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        hard_sync(jnp.arange(128.0) * 2)
    # jax profiler lays out plugins/profile/<run>/...
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace artifacts written"


def test_device_time_and_bench():
    f = lambda x: x * 2 + 1
    t = device_time(f, jnp.ones((64, 64)), warmup=1, iters=2)
    assert t > 0
    t2 = bench_compiled(lambda x: x @ x, jnp.ones((32, 32)), loops=5)
    assert t2 > 0


def test_timer_logs():
    msgs = []
    with Timer("phase", log_fn=msgs.append):
        pass
    assert msgs and "phase" in msgs[0]
