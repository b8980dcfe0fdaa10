"""Profiling / tracing hooks.

The reference's only profiling support is build-time instrumentation flags
(ghc-prof-options, SURVEY.md §5); here runtime tracing is first-class:

* :func:`trace` — context manager around ``jax.profiler.trace``: captures a
  perfetto/tensorboard trace of everything inside.
* :func:`annotate` — named scope so solver phases show up as labelled spans
  in the trace (wraps ``jax.profiler.TraceAnnotation``).
* :func:`op_timings` — quick wall-clock timing harness for jitted callables
  (compile time vs steady-state separated).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "op_timings"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed block into ``log_dir``
    (view with TensorBoard or perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for trace viewers: ``with annotate("factor:level3"): ...``"""
    return jax.profiler.TraceAnnotation(name)


def op_timings(fn, *args, iters: int = 20):
    """Measure (compile_seconds, steady_seconds_per_call) of a callable over
    device arrays."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady_s = (time.perf_counter() - t0) / iters
    return compile_s, steady_s
