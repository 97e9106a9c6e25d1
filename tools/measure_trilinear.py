#!/usr/bin/env python
"""Price the opt-in trilinear (mipmapped) texture filter in-pipeline.

Full production pipeline (backend='auto'), frames scanned inside one
jit exactly like bench.py; the only variable is Texture.filter. The
trilinear sampler skips the bilinear compacted/tier route (it runs the
plain planar sampler: two whole-frame row gathers with per-pixel level
indices), so the expected cost is roughly two full-frame gathers minus
the compacted tier's savings — this tool turns that into a recorded
number for docs/PERF.md.

Scenes: config4 (north-star, minified texels — the case mipmaps exist
for) and config2 (512^2 cube).

Run on TPU: nohup python tools/measure_trilinear.py > /tmp/tri.log 2>&1 &
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.ops import texture as tex_mod  # noqa: E402
from software_renderer_tpu.ops import transforms as tf  # noqa: E402


def bench_scene(name, rp, n_frames=96, frames_per_call=32):
    def transform_of(i):
        t = i.astype(jnp.float32) * (1.0 / 60.0)
        q = tf.quat_from_axis_angle(
            tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
        return rp.transform @ tf.rotation_matrix(q)

    @jax.jit
    def run(i0):
        def body(carry, i):
            fb = sr.render(
                dataclasses.replace(rp, transform=transform_of(i0 + i)))
            return carry + jnp.sum(fb.color), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(frames_per_call, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * frames_per_call),),
                    name=name, frames_per_call=frames_per_call,
                    warmup=2, iters=max(n_frames // frames_per_call, 4))
    print(f"{name:>28}: p50 {r.p50_ms:8.3f} ms  ({r.fps:7.2f} FPS)",
          flush=True)
    return r.p50_ms


def with_filter(rp, filt):
    tex = tex_mod.Texture(data=rp.texture.data, filter=filt,
                          wrap=rp.texture.wrap)
    return dataclasses.replace(rp, texture=tex)


def main():
    cells = [
        ("config4 1080p", lambda: scenes.config4_many_objects(0.0), 640, 32),
        ("config2 512^2", lambda: scenes.config2_textured_cube(0.0), 256, 64),
    ]
    for filt in ("bilinear", "trilinear"):
        print(f"--- filter = {filt}", flush=True)
        for name, mk, nf, fpc in cells:
            bench_scene(f"{filt}/{name}", with_filter(mk(), filt),
                        n_frames=nf, frames_per_call=fpc)


if __name__ == "__main__":
    main()
