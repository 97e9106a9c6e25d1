#!/usr/bin/env python
"""Time the windowed Mosaic sampler (ops/texture_kernel.py) against the
XLA quad-table row gather at production scale: tier-0.35 compacted count
(5670 segments = 726k pixels), [65536, 12] quad table vs per-channel
windowed tables, config4-like single-window segments plus a seam/wide
fraction.

Usage: python tools/measure_tex_kernel.py   (axon TPU)
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

from software_renderer_tpu.ops.texture import (
    TEX_GATHER_SPLIT, Texture, _quad_table, sample_texture_planes)
from software_renderer_tpu.ops.texture_kernel import (
    sample_segments_windowed, windowed_prep, windowed_tables)

rng = np.random.default_rng(0)
N_SCAN = 16
CAP = 5664          # multiple of 32, ~ tier 0.35 at 1080p
TH = TW = 256
C = 3


def timed(name, fn, *args):
    @jax.jit
    def run(i0, *a):
        def body(carry, i):
            return carry + fn(i0 + i, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N_SCAN, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * N_SCAN),) + args,
                    name=name, frames_per_call=N_SCAN, warmup=2, iters=8)
    print(f"{name:>54}: {r.p50_ms:8.3f} ms", flush=True)
    return r.p50_ms


def make_uv(wide_frac=0.03):
    """Per-segment clustered v (spread <= ~2 texel rows, like the bench
    scene) with a few wide/seam segments."""
    v0 = rng.uniform(0, 1, size=(CAP, 1))
    spread = np.where(rng.random((CAP, 1)) < wide_frac, 0.9, 0.008)
    v = (v0 + rng.uniform(0, 1, size=(CAP, 128)) * spread) % 1.0
    u = rng.uniform(0, 1, size=(CAP, 128))
    return (jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32))


def main():
    data = jnp.asarray(rng.random((TH, TW, C)), jnp.float32)
    tex = Texture(data=data)
    u, v = make_uv()
    cov = jnp.ones((CAP, 128), bool)
    tabs = windowed_tables(data, "repeat")
    xa, dy, fx, fy, y0, nwin = windowed_prep(u, v, cov, th=TH, tw=TW,
                                             wrap="repeat")
    print("mean nwin:", float(jnp.mean(nwin.astype(jnp.float32))),
          flush=True)

    # correctness on hardware first
    got = sample_segments_windowed(tabs, xa, dy, fx, fy, y0, nwin,
                                   th=TH, tw=TW, wrap="repeat")
    want = sample_texture_planes(tex, u, v)
    for ci in range(C):
        d = np.abs(np.asarray(got[ci]) - np.asarray(want[ci])).max()
        print(f"  chan {ci} max |diff| vs XLA: {d:.3e}", flush=True)

    # kernel: index prep OUTSIDE the timed body (matches production,
    # where prep is part of the tier); then prep INSIDE (upper bound).
    timed("windowed kernel (prep outside)",
          lambda i, *a: sum(jnp.sum(p) for p in
                            sample_segments_windowed(
                                list(a[:C]), a[C] + 0 * i, *a[C + 1:],
                                th=TH, tw=TW, wrap="repeat")),
          *tabs, xa, dy, fx, fy, y0, nwin)

    def full_win(i, ua, va):
        xa2, dy2, fx2, fy2, y02, nw2 = windowed_prep(
            jnp.mod(ua + i * 1e-3, 1.0), va, cov, th=TH, tw=TW,
            wrap="repeat")
        return sum(jnp.sum(p) for p in sample_segments_windowed(
            tabs, xa2, dy2, fx2, fy2, y02, nw2, th=TH, tw=TW,
            wrap="repeat"))

    timed("windowed kernel + prep (fresh u)", full_win, u, v)

    # XLA baseline: the shipped split-2 quad gather at the same count.
    quad = _quad_table(tex)
    flat = (jnp.mod(jnp.floor(v * TH - 0.5).astype(jnp.int32), TH) * TW
            + jnp.mod(jnp.floor(u * TW - 0.5).astype(jnp.int32), TW))

    def xla_gather(i, f):
        ci = (f + i) & (TH * TW - 1)
        s = TEX_GATHER_SPLIT
        half = CAP // s * 128
        parts = [quad[ci.reshape(-1)[j * half:(j + 1) * half]
                      .reshape(-1, 128)] for j in range(s)]
        return sum(jnp.sum(p) for p in parts)

    timed(f"XLA quad row gather (split {TEX_GATHER_SPLIT})", xla_gather,
          flat)


if __name__ == "__main__":
    main()
