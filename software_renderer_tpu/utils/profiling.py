"""Profiling and tracing.

The reference computes per-command-buffer GPU timings but never calls them
(Metal+Extensions.swift:392-399 — SURVEY.md §5 "no tracer"). Here: a
context manager for ``jax.profiler`` traces (inspect in TensorBoard /
Perfetto), a named-span helper, and a tiny stage-timing registry built on
``block_until_ready`` for quick breakdowns without a trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

stage_times: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sr_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def span(name: str):
    """Named span inside a profiler trace (shows up in the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(name: str, result=None):
    """Wall-clock a stage; blocks on `result` (or whatever the body sets
    via ``out.append(...)``) so device work is included."""
    t0 = time.perf_counter()
    out = []
    yield out
    if out:
        jax.block_until_ready(out[-1])
    elif result is not None:
        jax.block_until_ready(result)
    stage_times[name].append(time.perf_counter() - t0)


def report() -> str:
    lines = []
    for name, times in stage_times.items():
        n = len(times)
        mean = sum(times) / n
        lines.append(f"{name}: n={n} mean={mean * 1e3:.3f} ms "
                     f"last={times[-1] * 1e3:.3f} ms")
    return "\n".join(lines)
