"""Profiling & tracing utilities (SURVEY.md §5.1 — the reference has only
wall-clock prints around trainer.fit; here: real device traces).

- `trace(logdir)`: context manager around jax.profiler — produces an
  xprof/perfetto-compatible trace of XLA ops and Pallas kernels.
- `annotate(name)`: named TraceAnnotation that shows up inside traces.
- `time_fn(fn, *args)`: robust steady-state timing of a jitted callable
  with block_until_ready (used by bench.py and the kernel microbench).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """with annotate('gat_layer_0'): ... — named region in the trace."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args,
            warmup: int = 2, iters: int = 10) -> Tuple[float, Any]:
    """Median-of-iters seconds per call, after warmup. Returns
    (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out
