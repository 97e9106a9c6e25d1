#!/usr/bin/env python
"""Microbenchmarks of the binning primitives on real TPU.

Each op runs inside a lax.scan with per-iteration-varying inputs (xor of
the loop counter) so XLA cannot constant-fold or cache across frames —
see CLAUDE.md's microbenchmark caveat.
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
    print(f"{name:>42}: {r.p50_ms:8.3f} ms", flush=True)


def main():
    base12 = jnp.asarray(rng.integers(0, 2**30, size=1_200_000), jnp.int32)
    base3 = base12[:300_000]
    base1 = base12[:100_000]
    table = jnp.asarray(rng.random((100_000, 35)), jnp.float32)
    idx233 = jnp.asarray(rng.integers(0, 100_000, size=233_472), jnp.int32)
    idx158 = idx233[:158_000]
    cum = jnp.cumsum(jnp.asarray(rng.integers(0, 4, size=100_000),
                                 jnp.int32))
    j200 = jnp.arange(200_000, dtype=jnp.int32)

    timed("sort 1.2M i32", lambda i: jnp.sum(jnp.sort(base12 ^ i)))
    timed("sort 300k i32", lambda i: jnp.sum(jnp.sort(base3 ^ i)))
    timed("sort 100k i32", lambda i: jnp.sum(jnp.sort(base1 ^ i)))
    timed("gather 233k rows x35", lambda i: jnp.sum(
        table[(idx233 + i) % 100_000]))
    timed("gather 158k rows x35", lambda i: jnp.sum(
        table[(idx158 + i) % 100_000]))
    timed("gather 233k rows x16", lambda i: jnp.sum(
        table[(idx233 + i) % 100_000, :16]))
    timed("searchsorted 200k in 100k (scan)", lambda i: jnp.sum(
        jnp.searchsorted(cum + i, j200, side="right")))
    timed("searchsorted 200k in 100k (sort)", lambda i: jnp.sum(
        jnp.searchsorted(cum + i, j200, side="right", method="sort")))
    timed("cumsum 1.2M i32", lambda i: jnp.sum(jnp.cumsum(base12 ^ i)))
    timed("cumsum 100k i32", lambda i: jnp.sum(jnp.cumsum(base1 ^ i)))
    timed("argsort-u32-pairs 233k", lambda i: jnp.sum(
        jnp.sort((idx233 ^ i).astype(jnp.int32))))

    # Texture-gather shapes: 2M pixels from a 65536-row quad table.
    quad_f32 = jnp.asarray(rng.random((65536, 12)), jnp.float32)
    quad_f16 = quad_f32.astype(jnp.float16)
    quad_u8 = (quad_f32 * 255).astype(jnp.uint8)
    pix = jnp.asarray(rng.integers(0, 65536, size=2_073_600), jnp.int32)
    pix2d = pix.reshape(1080, 1920)
    timed("texgather 2M rows x12 f32", lambda i: jnp.sum(
        quad_f32[(pix + i) & 65535]))
    timed("texgather 2M rows x12 f16", lambda i: jnp.sum(
        quad_f16[(pix + i) & 65535].astype(jnp.float32)))
    timed("texgather 2M rows x12 u8", lambda i: jnp.sum(
        quad_u8[(pix + i) & 65535].astype(jnp.float32)))
    timed("texgather 2M 2D-idx x12 f32", lambda i: jnp.sum(
        quad_f32[(pix2d + i) & 65535]))
    timed("texgather 2M flat scalar f32", lambda i: jnp.sum(
        quad_f32[:, 0][(pix + i) & 65535]))
    # take_along_axis sublane-table form: 256-entry per-lane tables.
    tab256 = jnp.asarray(rng.random((256, 128)), jnp.float32)
    idx_tla = jnp.asarray(rng.integers(0, 256, size=(16200, 128)),
                          jnp.int32)
    timed("take_along_axis 2M in 256-tab", lambda i: jnp.sum(
        jnp.take_along_axis(tab256, (idx_tla + i) % 256, axis=0)))

    # Vertex-stage layouts: packed [T, 3, 3] corners vs planar [3, 3, T].
    t100 = 100_000
    corners = jnp.asarray(rng.random((t100, 3, 3)), jnp.float32)
    corners_cf = jnp.asarray(np.moveaxis(np.asarray(corners), 0, -1))

    def vtx_packed(i):
        mat = jnp.eye(4, dtype=jnp.float32) * (1.0 + i * 1e-6)
        flat = corners.reshape(-1, 3)
        clip = (flat @ mat[:3, :3].T + mat[:3, 3]
                )  # [3T, 3]
        w = flat @ mat[3, :3] + mat[3, 3]
        ndc = clip / jnp.where(w == 0, 1.0, w)[:, None]
        pix = jnp.sign(ndc) * jnp.floor(jnp.abs(ndc) + 0.5)
        return jnp.sum(pix)

    def vtx_planar(i):
        mat = jnp.eye(4, dtype=jnp.float32) * (1.0 + i * 1e-6)
        x, y, z = corners_cf[0], corners_cf[1], corners_cf[2]  # [3, T]
        w = mat[3, 0] * x + mat[3, 1] * y + mat[3, 2] * z + mat[3, 3]
        winv = 1.0 / jnp.where(w == 0, 1.0, w)
        out = 0.0
        for r in range(3):
            cr = mat[r, 0] * x + mat[r, 1] * y + mat[r, 2] * z + mat[r, 3]
            ndc = cr * winv
            out = out + jnp.sum(jnp.sign(ndc) * jnp.floor(jnp.abs(ndc) + 0.5))
        return out

    timed("vertex 300k packed [T,3,3]", vtx_packed)
    timed("vertex 300k planar [3,3,T]", vtx_planar)


if __name__ == "__main__":
    main()
