#!/usr/bin/env python
"""Headline benchmark: FPS / Mtri/s / p50 frame time on the north-star
scene (BASELINE.json config 4: ~100k-triangle multi-mesh scene, Phong +
bilinear textures, 1920x1080, one chip).

Prints ONE JSON line:
  {"metric": ..., "value": <FPS>, "unit": "fps", "vs_baseline": <value/60>}

vs_baseline is against the 60 FPS north-star target (the reference
publishes no numbers of its own — BASELINE.md).

Flags (env):
  BENCH_SCENE=config1|config2|config3|config4 (default config4)
  BENCH_TRIS=<int>      triangle budget for config4 (default 100000)
  BENCH_ITERS=<int>     timed frames (default 20)
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.ops import transforms as tf  # noqa: E402


def bench_config5(rp, n_tris, iters):
    """Config 5: batched render over 64 animated frames (vmap groups
    scanned to bound memory)."""
    import jax
    from software_renderer_tpu.parallel.batch import render_batch_chunked

    n_frames = int(os.environ.get("BENCH_BATCH", "64"))
    # Stride the batch across the SAME animation range config4's p50
    # covers (704 frames, t in [0, 11.7 s)) so the two numbers are
    # comparable on their face — r3 measured consecutive frames
    # t in [0, 1.05 s), the cheap low-coverage part of the animation,
    # which overstated batched FPS vs config4's full-range p50.
    total_frames = float(os.environ.get("BENCH_ANIM_FRAMES", "704"))
    stride = total_frames / n_frames / 60.0
    times = jnp.arange(n_frames, dtype=jnp.float32) * stride
    transforms = jax.vmap(
        lambda t: rp.transform @ tf.rotation_matrix(
            tf.quat_from_axis_angle(
                tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t))
    )(times)

    # vmap width: wide vmap inflates every pipeline intermediate by the
    # chunk factor; measured on v5e, scan-pipelined frames (chunk 1) beat
    # vmap x4 by ~2x at this scene size. The knob stays for smaller scenes.
    vmap_chunk = int(os.environ.get("BENCH_VMAP_CHUNK", "1"))

    def run(shift):
        fb = render_batch_chunked(
            rp, transforms @ tf.rotation_matrix(
                tf.quat_from_axis_angle(
                    jnp.array([0.0, 1.0, 0.0], jnp.float32), shift)),
            backend="binned", vmap_chunk=vmap_chunk)
        # Full-frame reduction per frame: nothing can be dead-code
        # eliminated, and only [n_frames] scalars leave the device.
        return jnp.sum(fb.color, axis=(1, 2, 3))

    result = bench_frame(
        run, lambda i: (jnp.float32(i) * 0.01,),
        name=f"config5 batched x{n_frames} {rp.width}x{rp.height} "
             f"{n_tris} tris",
        triangles=n_tris, frames_per_call=n_frames,
        warmup=1, iters=max(iters // 4, 2))
    print(result, file=sys.stderr)
    print(json.dumps({
        "metric": (f"FPS (batched x{n_frames}) at {rp.width}x{rp.height}, "
                   f"{n_tris}-triangle textured scene (config5), frames "
                   f"strided over the full {int(total_frames)}-frame "
                   f"animation (same range as config4's p50); p50 "
                   f"{result.p50_ms:.3f} ms/frame, "
                   f"{result.mtri_s:.1f} Mtri/s"),
        "value": round(result.fps, 2),
        "unit": "fps",
        "vs_baseline": round(result.fps / 60.0, 3),
    }))


def main():
    scene_name = os.environ.get("BENCH_SCENE", "config4")
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    tris = int(os.environ.get("BENCH_TRIS", "100000"))

    if scene_name == "config1":
        rp = scenes.config1_flat_cube(0.0)
    elif scene_name == "config2":
        rp = scenes.config2_textured_cube(0.0)
    elif scene_name == "config3":
        rp = scenes.config3_phong_mesh(0.0)
    else:  # config4 and the batched config5 share the scene
        rp = scenes.config4_many_objects(0.0, triangles=tris)
    n_tris = int(rp.mesh.indices.shape[0] // 3)

    if scene_name == "config5":
        return bench_config5(rp, n_tris, iters)

    # Animated per-frame transforms (no two frames identical). Frames are
    # rendered in groups of FRAMES_PER_CALL inside one jit (lax.scan) so
    # the fixed host->device dispatch latency (tens of ms through the axon
    # tunnel) is amortized out of the per-frame figure — the steady-state
    # rendering regime.
    base_model_proj = rp.transform
    frames_per_call = int(os.environ.get("BENCH_FRAMES_PER_CALL", "32"))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    def transform_of(i):
        t = i.astype(jnp.float32) * (1.0 / 60.0)
        q = tf.quat_from_axis_angle(
            tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
        return base_model_proj @ tf.rotation_matrix(q)

    @jax.jit
    def run(i0):
        def body(carry, i):
            fb = sr.render(
                dataclasses.replace(rp, transform=transform_of(i0 + i)),
                backend=backend)
            # Consume the FULL frame (one cheap reduce) so no part of any
            # frame is dead-code-eliminated; only the scalar leaves the
            # device.
            return carry + jnp.sum(fb.color), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(frames_per_call, dtype=jnp.int32))
        return acc

    result = bench_frame(
        run, lambda i: (jnp.int32(i * frames_per_call),),
        name=f"{scene_name} {rp.width}x{rp.height} {n_tris} tris",
        triangles=n_tris, frames_per_call=frames_per_call,
        warmup=2, iters=iters)
    print(result, file=sys.stderr)

    print(json.dumps({
        "metric": (f"FPS at {rp.width}x{rp.height}, {n_tris}-triangle "
                   f"textured/Phong scene ({scene_name}), single chip; "
                   f"p50 {result.p50_ms:.3f} ms, {result.mtri_s:.1f} Mtri/s"),
        "value": round(result.fps, 2),
        "unit": "fps",
        "vs_baseline": round(result.fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
