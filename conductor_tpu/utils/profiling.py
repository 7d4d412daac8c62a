"""Profiling hooks: jax.profiler traces + per-step timing.

The reference has no tracing/profiling at all (SURVEY.md §5.1 — tqdm bars and
wall-clock prints only).  These helpers are load-bearing for the
frames/sec/chip north star: `trace` captures a TensorBoard-viewable XLA trace
of any code region, `StepTimer` measures steady-state step latency with
device synchronization, and `annotate` names regions inside traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region (view with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state step timing with explicit device sync.

    >>> timer = StepTimer(warmup=2)
    >>> for batch in data:
    ...     out = step(...)
    ...     timer.tick(out)          # blocks on `out`, records elapsed
    >>> timer.summary()              # {'mean_s', 'p50_s', 'best_s', 'steps'}
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._seen = 0
        self._last = time.perf_counter()

    def tick(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return dt

    def summary(self) -> dict[str, float]:
        if not self._times:
            return {"steps": 0}
        ts = sorted(self._times)
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "p50_s": ts[len(ts) // 2],
            "best_s": ts[0],
        }
