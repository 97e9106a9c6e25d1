#!/usr/bin/env python
"""A/B the scene-agnostic texture cap ladder (texture.TEX_CAP_LADDER)
against round-3's benchmark-fitted tier list (0.28, 0.35, 0.45, 0.60)
on scenes the ladder was NOT derived from (VERDICT r3 item 5):

  * config4 (the north-star — must not regress),
  * config2 (512^2 textured cube),
  * a NON-bench scene: the Utah teapot with bilinear texturing at
    1920x1080 (different coverage profile: one compact object, ~5k tris).

Each cell is a p50 frame time over an animated range rendered through
the full production pipeline (backend='auto'), frames scanned inside one
jit exactly like bench.py.

Run on TPU: nohup python tools/measure_ladder.py > /tmp/ladder.log 2>&1 &
"""

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.models.scenes import _teapot_mesh  # noqa: E402
from software_renderer_tpu.ops import texture as tex_mod  # noqa: E402
from software_renderer_tpu.ops import transforms as tf  # noqa: E402
from software_renderer_tpu.render import RenderPass  # noqa: E402
from software_renderer_tpu.ops.shading import Light  # noqa: E402

FITTED_R3 = (0.28, 0.35, 0.45, 0.60)
LADDER = tex_mod.TEX_CAP_LADDER
_orig = tex_mod.sample_texture_planes_compacted


def textured_teapot(time, width=1920, height=1080):
    mesh = _teapot_mesh()
    t = jnp.asarray(time, jnp.float32)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 0.7, 0.2], jnp.float32)), t)
    model = tf.trs_matrix(translation=(0.0, 0.0, 1.0), rotation=q,
                          scale=(1.5, 1.5, 1.5))
    return RenderPass(mesh=mesh,
                      transform=tf.reference_projection() @ model,
                      width=width, height=height, shading="textured",
                      texture=tex_mod.checkerboard(256, 16),
                      light=Light.default(), model=model,
                      cull_backfaces=True)


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
    print(f"{name:>32}: p50 {r.p50_ms:8.3f} ms  ({r.fps:7.2f} FPS)",
          flush=True)
    return r.p50_ms


def with_caps(caps):
    tex_mod.sample_texture_planes_compacted = functools.partial(
        _orig, cap_fracs=caps)


def main():
    cells = [
        ("config4 1080p", lambda: scenes.config4_many_objects(0.0), 640, 32),
        ("config2 512^2", lambda: scenes.config2_textured_cube(0.0), 256, 64),
        ("teapot-tex 1080p (non-bench)", lambda: textured_teapot(0.0),
         256, 64),
    ]
    for label, caps in [("ladder", LADDER), ("fitted-r3", FITTED_R3)]:
        with_caps(caps)
        print(f"--- cap_fracs = {label} {tuple(round(c, 4) for c in caps)}",
              flush=True)
        for name, mk, nf, fpc in cells:
            bench_scene(f"{label}/{name}", mk(), n_frames=nf,
                        frames_per_call=fpc)
    tex_mod.sample_texture_planes_compacted = _orig


if __name__ == "__main__":
    main()
