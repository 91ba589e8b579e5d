"""Profiling / step-timing utilities (the reference has none — SURVEY §5).

  * `trace(log_dir)` — context manager around `jax.profiler` for device
    traces viewable in TensorBoard / Perfetto.
  * `StepTimer` — wall-clock per-step timing with summary percentiles.
    NOTE: on the tunneled TPU backend `block_until_ready` can be unreliable;
    pass a `barrier` callable that fetches a host scalar to force completion.
"""

import contextlib
import time
from typing import Callable, Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, barrier: Optional[Callable] = None):
        if barrier is not None:
            barrier()
        self._times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def step(self, barrier: Optional[Callable] = None):
        self.start()
        try:
            yield
        finally:
            self.stop(barrier)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(n * 0.9))],
            "steps_per_sec": n / sum(ts),
        }
