"""Profiling utilities (SURVEY §5: the reference has none)."""

import os

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.utils.profiling import StepTimer, trace


def test_trace_writes_profile(tmp_path):
    f = jax.jit(lambda x: jnp.sum(x * x))
    with trace(str(tmp_path)):
        float(f(jnp.arange(128.0)))
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "jax.profiler produced no trace files"


def test_step_timer_summary():
    t = StepTimer()
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.arange(1024.0)
    for _ in range(5):
        with t.step(barrier=lambda: float(f(x))):
            f(x)
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_s"] > 0 and s["steps_per_sec"] > 0
    assert s["p50_s"] <= s["p90_s"] * 1.0001
