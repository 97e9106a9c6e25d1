"""Benchmark harness: frame timing, FPS, Mtri/s.

The reference computes GPU timings but never reads them
(Metal+Extensions.swift:392-399, SURVEY.md §5); this module is the missing
measurement layer. All timing is wall-clock around ``block_until_ready`` on
jitted functions (the TPU-correct way to time a fused frame).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np


@dataclass
class BenchResult:
    name: str
    frames: int
    p50_ms: float
    mean_ms: float
    fps: float
    mtri_s: float
    compile_s: float

    def __str__(self):
        return (f"{self.name}: p50 {self.p50_ms:.3f} ms | mean "
                f"{self.mean_ms:.3f} ms | {self.fps:.1f} FPS | "
                f"{self.mtri_s:.1f} Mtri/s (compile {self.compile_s:.1f}s)")


def bench_frame(fn, args_fn, *, name: str = "frame", triangles: int = 0,
                frames_per_call: int = 1, warmup: int = 2,
                iters: int = 20) -> BenchResult:
    """Time fn(args_fn(i)) over iters calls.

    args_fn(i) -> args tuple (varying per iteration so results can't be
    constant-folded/cached across frames).
    """
    t0 = time.perf_counter()
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for i in range(warmup):
        out = fn(*args_fn(i + 1))
    jax.block_until_ready(out)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args_fn(i + warmup + 1))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    per_frame = times / frames_per_call
    p50 = float(np.percentile(per_frame, 50))
    mean = float(per_frame.mean())
    return BenchResult(
        name=name, frames=iters * frames_per_call,
        p50_ms=p50 * 1e3, mean_ms=mean * 1e3, fps=1.0 / p50,
        mtri_s=triangles / p50 / 1e6 if triangles else 0.0,
        compile_s=compile_s,
    )


def enable_compile_cache(path: str = None):
    """Persistent XLA compile cache (first tunnel compiles are minutes).

    The cache directory is per-platform: under axon, host-side XLA:CPU
    compiles happen on the REMOTE tunnel machine, whose CPU features
    differ from this host — loading such an AOT entry from a local CPU
    process SIGSEGVs (cpu_aot_loader machine-feature mismatch). Keeping
    cpu/ and axon/ entries separate makes the two runtimes never read
    each other's executables (tests/conftest.py uses the cpu/ path).
    """
    if path is None:
        import os
        plat = os.environ.get("JAX_PLATFORMS", "axon") or "axon"
        path = f"/root/repo/.jax_cache/{plat.split(',')[0]}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
