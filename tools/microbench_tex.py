#!/usr/bin/env python
"""Texture-gather layout variants (the 7 ms tail): is the narrow-minor
[H, W, 12] gather OUTPUT part of the cost, and does table size matter?

Measured (v5e, 2026-08-17): baseline 6.81 ms; transposed-table indexing
6.95; 16k-row table 6.77 — the gather is row-ISSUE-bound (~3.3 ns/row),
independent of table size and output orientation; 1080p bilinear has a
~6.8 ms floor. Consuming the gathered [H, W, 12] via per-channel slices
in isolation costs 22 ms (narrow-minor relayout per slice) — the real
pipeline avoids this because XLA fuses the lerp consumers into one pass.
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

N_SCAN = 16
rng = np.random.default_rng(0)


def timed(name, make):
    @jax.jit
    def run(i0):
        def body(carry, i):
            return carry + make(i0 + i), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N_SCAN, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * N_SCAN),), name=name,
                    frames_per_call=N_SCAN, warmup=2, iters=8)
    print(f"{name:>44}: {r.p50_ms:8.3f} ms", flush=True)


def main():
    quad = jnp.asarray(rng.random((65536, 12)), jnp.float32)
    quad_t = jnp.asarray(np.asarray(quad).T)          # [12, 65536]
    quad_small = quad[:16384]
    pix2d = jnp.asarray(rng.integers(0, 65536, size=(1080, 1920)),
                        jnp.int32)

    timed("baseline [H,W]-idx rows x12", lambda i: jnp.sum(
        quad[(pix2d + i) & 65535]))
    # Index-SHAPE sweep at the compacted row count (tier 0.35 at 1080p
    # gathers ~726k rows as [cap, 128]): is the measured ~6.7 ns/row in
    # the compacted layout (vs ~3.3 full-frame, PERF.md step 15) a real
    # property of the [*, 128]-minor index shape, or attribution of the
    # fixed compaction overhead to the gather line?
    pix_c = jnp.asarray(rng.integers(0, 65536, size=(5670, 128)),
                        jnp.int32)
    for shape in [(5670, 128), (2835, 256), (1417, 512), (708, 1024),
                  (378, 1920), (5670 * 128,)]:
        n = 1
        for s in shape:
            n *= s
        p = pix_c.reshape(-1)[:n].reshape(shape)
        timed(f"compacted-count idx {shape}", lambda i, p=p: jnp.sum(
            quad[(p + i) & 65535]))
    timed("rows x12, consumed per-channel", lambda i: sum(
        jnp.sum(quad[(pix2d + i) & 65535][..., c]) for c in range(12)))
    timed("transposed quadT[:, idx2d]", lambda i: jnp.sum(
        quad_t[:, (pix2d + i) & 65535]))
    timed("small table 16k rows x12", lambda i: jnp.sum(
        quad_small[(pix2d + i) & 16383]))
    # NOTE: a "two 6-wide gathers" variant (quad[idx, :6] + quad[idx, 6:])
    # hit a TPU device fault on v5e — sliced-operand gathers appear to
    # miscompile; avoid that form.


if __name__ == "__main__":
    main()
