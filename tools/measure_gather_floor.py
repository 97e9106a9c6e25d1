#!/usr/bin/env python
"""Characterize the TPU row-gather cost curve (the texture tail's floor).

Round-4 shape sweep (tools/microbench_tex.py) found the compacted-count
gather (726k rows of a [65536, 12] table) costs ~5.0 ms for every index
shape while the full-frame 2.07M-row gather costs 6.78 ms — 2.85x fewer
rows, only 1.35x faster. This probe separates the hypotheses:

  a) count curve      — gather ms vs row count (is there a floor, or a
                        low-occupancy small-count regime?)
  b) split ops        — one n-row gather vs two (n/2)-row gathers in the
                        same scan step (per-op overhead vs per-row cost)
  c) row width        — table [65536, c] for c in {4, 8, 12, 16} at
                        fixed count (issue-bound vs byte-bound)
  d) index locality   — sorted vs random indices at fixed count
  e) scan length      — per-frame figure at N_SCAN 16 vs 64 (fixed
                        per-step overhead attribution)
  f) table residency  — small [4096, 12] table at fixed count (VMEM-
                        resident table vs HBM)

Usage: python tools/measure_gather_floor.py   (axon TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def timed(name, make, n_scan=16):
    @jax.jit
    def run(i0):
        def body(carry, i):
            return carry + make(i0 + i), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n_scan, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * n_scan),), name=name,
                    frames_per_call=n_scan, warmup=2, iters=8)
    print(f"{name:>46}: {r.p50_ms:8.3f} ms", flush=True)
    return r.p50_ms


def main():
    quad = jnp.asarray(rng.random((65536, 12)), jnp.float32)
    full_idx = jnp.asarray(rng.integers(0, 65536, size=2073600), jnp.int32)

    # (a) count curve, [n/128, 128] index shape (the production layout).
    for n in (129024, 259072, 518144, 725760, 1036800, 1554432, 2073600):
        p = full_idx[:n].reshape(-1, 128)
        timed(f"(a) count {n:>8} rows", lambda i, p=p: jnp.sum(
            quad[(p + i) & 65535]))

    n = 725760
    p = full_idx[:n].reshape(-1, 128)
    ph = full_idx[: n // 2].reshape(-1, 128)
    ph2 = full_idx[n // 2: n].reshape(-1, 128)

    # (b) per-op overhead: two half gathers in one step.
    timed("(b) 2x half gathers (same step)", lambda i: jnp.sum(
        quad[(ph + i) & 65535]) + jnp.sum(quad[(ph2 + i) & 65535]))

    # (c) row width at fixed count.
    for c in (4, 8, 16):
        q = quad[:, :c] if c <= 12 else jnp.concatenate(
            [quad, quad[:, :c - 12]], axis=1)
        timed(f"(c) width {c:>2} at 726k rows", lambda i, q=q: jnp.sum(
            q[(p + i) & 65535]))

    # (d) locality: sorted indices (contiguous table walks).
    ps = jnp.sort(p.reshape(-1)).reshape(-1, 128)
    timed("(d) sorted idx at 726k rows", lambda i: jnp.sum(
        quad[(ps + i) & 65535]))
    # monotone BLOCK-sorted: sorted within each 128-lane row only.
    prs = jnp.sort(p, axis=1)
    timed("(d) row-sorted idx at 726k rows", lambda i: jnp.sum(
        quad[(prs + i) & 65535]))

    # (e) scan-length attribution.
    timed("(e) 726k rows, N_SCAN=64", lambda i: jnp.sum(
        quad[(p + i) & 65535]), n_scan=64)
    timed("(e) 2.07M rows, N_SCAN=64", lambda i: jnp.sum(
        quad[(full_idx.reshape(-1, 128) + i) & 65535]), n_scan=64)

    # (f) VMEM-resident table size.
    q4k = quad[:4096]
    timed("(f) 4096-row table, 726k rows", lambda i: jnp.sum(
        q4k[(p + i) & 4095]))


if __name__ == "__main__":
    main()
