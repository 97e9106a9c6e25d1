#!/usr/bin/env python
"""In-pipeline A/B for the Mosaic windowed texture sampler on the
content class it was built for: a UV-COHERENT textured close-up (a big
screen-filling textured surface — think floor/wall/billboard), where
each compacted 128-pixel row segment covers 1-3 texel-row slabs and the
adaptive route can skip the XLA row gather — and its ~2.5-2.9 ms
count-independent issue floor (tools/profile_gather_floor.py) —
entirely.

Scene: a subdivided full-screen quad at 1080p (8192 triangles so the
production binned machinery engages), 256^2 smooth texture, slow zoom +
drift animation (no two frames identical), shading="textured". The
headline config4 scene is the OPPOSITE content class (UV-incoherent,
mean 10-22 distinct slabs/segment, tools/measure_slab_clusters.py) —
the adaptive lax.cond takes the XLA branch there by design.

Usage: nohup python tools/measure_windowed_win.py > /tmp/win_ab.log &
Prints FPS for SR_TEX_WINDOWED in ("0", "adaptive", "1") on this scene.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu.ops import texture as tex_mod  # noqa: E402
from software_renderer_tpu.ops import transforms as tf  # noqa: E402

W, H = 1920, 1080
GRID = 64          # GRID*GRID*2 = 8192 triangles
ITERS = int(os.environ.get("BENCH_ITERS", "12"))
FRAMES_PER_CALL = int(os.environ.get("BENCH_FRAMES_PER_CALL", "32"))


def closeup_scene():
    g = GRID
    ys, xs = np.mgrid[0:g + 1, 0:g + 1].astype(np.float32) / g
    positions = np.stack([xs * 2 - 1, ys * 2 - 1, np.zeros_like(xs)],
                         axis=-1).reshape(-1, 3)
    uvs = np.stack([xs, ys], axis=-1).reshape(-1, 2)
    normals = np.tile(np.array([[0, 0, -1]], np.float32),
                      (positions.shape[0], 1))
    colors = np.ones((positions.shape[0], 3), np.float32)
    vid = (np.arange((g + 1) * (g + 1)).reshape(g + 1, g + 1))
    a = vid[:-1, :-1].ravel()
    b = vid[:-1, 1:].ravel()
    c = vid[1:, 1:].ravel()
    d = vid[1:, :-1].ravel()
    indices = np.stack([a, b, c, a, c, d], axis=1).reshape(-1)
    mesh = sr.mesh_from_numpy(positions, indices, colors=colors,
                              normals=normals, uvs=uvs)
    rng = np.random.default_rng(3)
    data = rng.random((256, 256, 3)).astype(np.float32)
    for ax in (0, 1):   # one box-blur pass: smooth, bilinear-friendly
        data = (data + np.roll(data, 1, ax) + np.roll(data, -1, ax)) / 3
    texture = sr.Texture(data=jnp.asarray(data))
    # Screen-filling, slightly overscanned so every row segment is
    # covered; w = z+1 = 1 keeps UVs affine across the screen (the
    # coherent-content limit).
    return sr.RenderPass(mesh=mesh, transform=jnp.eye(4, dtype=jnp.float32),
                         width=W, height=H, shading="textured",
                         texture=texture)


def run_mode(rp, mode: str):
    old = tex_mod.TEX_WINDOWED
    tex_mod.TEX_WINDOWED = mode
    try:
        base = rp.transform

        def transform_of(i):
            t = i.astype(jnp.float32) * (1.0 / 60.0)
            s = 1.05 + 0.05 * jnp.sin(t)          # slow zoom
            drift = 0.02 * jnp.sin(0.7 * t)       # sub-texel drift
            m = jnp.array([[s, 0, 0, drift], [0, s, 0, 0],
                           [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32)
            return base @ m

        @jax.jit
        def run(i0):
            def body(carry, i):
                fb = sr.render(dataclasses.replace(
                    rp, transform=transform_of(i0 + i)), backend="binned")
                return carry + jnp.sum(fb.color), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(FRAMES_PER_CALL, dtype=jnp.int32))
            return acc

        result = bench_frame(
            run, lambda i: (jnp.int32(i * FRAMES_PER_CALL),),
            name=f"closeup {W}x{H} mode={mode}",
            triangles=GRID * GRID * 2, frames_per_call=FRAMES_PER_CALL,
            warmup=2, iters=ITERS)
        print(f"mode={mode:>8}: p50 {result.p50_ms:.3f} ms | "
              f"mean {result.mean_ms:.3f} ms | {result.fps:.1f} FPS",
              flush=True)
        return result
    finally:
        tex_mod.TEX_WINDOWED = old


def main():
    rp = closeup_scene()
    for mode in ("0", "adaptive", "1"):
        run_mode(rp, mode)


if __name__ == "__main__":
    main()
