"""Split the planar front-end's ~2.2 ms/frame (docs/PERF.md) into its
math vs table-materialization parts, to size a possible Pallas FE kernel.

Variants (each scanned over FRAMES frames in one jit, consumed by cheap
[T]-column reduces so every column materializes but nothing forces a
layout):
  A. planar_front only (vertex + setup math, ~22 [T] columns)
  B. A + attribute plane columns (textured+light channel set)
  C. B + stream table stack WITHOUT transpose ([wtot, T], reduce rows)
  D. C with the production transpose ([T, wtot], reduce) == prod FE

Usage: nohup python tools/microbench_planar_split.py > /tmp/split.log &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import frontend as fe
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.shading import gather_attribute_values

W = int(os.environ.get("PROF_W", "1920"))
H = int(os.environ.get("PROF_H", "1080"))
TRIS = int(os.environ.get("PROF_TRIS", "100000"))
FRAMES = int(os.environ.get("PROF_FRAMES", "16"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))

rp = scenes.config4_many_objects(0.0, width=W, height=H, triangles=TRIS)
mesh = rp.mesh
tris = mesh.triangles()
corners = mesh.positions[tris]
corners_c = fe.corner_cols(corners)
attrs, chans = gather_attribute_values(
    rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
    uvs=mesh.uvs, has_light=rp.light is not None)
attr_cols = fe.attr_corner_cols(attrs)


def transform_of(i):
    t = i.astype(jnp.float32) * (1.0 / 60.0)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
    return rp.transform @ tf.rotation_matrix(q)


def front(i):
    return fe.planar_front(corners_c, transform_of(i), W, H,
                           cull_backfaces=rp.cull_backfaces)


def consume_ps(ps):
    acc = jnp.float32(0)
    for f in ("a0", "a1", "a2", "b0", "b1", "b2", "c0", "c1", "c2",
              "zx", "zy", "zc", "abs_d", "inv_area", "area2",
              "w1", "w2", "w3"):
        acc = acc + jnp.sum(getattr(ps, f))
    acc = acc + jnp.sum(ps.bx0 + ps.by0 + ps.bx1 + ps.by1).astype(
        jnp.float32)
    return acc + jnp.sum(ps.valid)


def step_a(i):
    return consume_ps(front(i))


def plane_cols_of(ps):
    return fe.attribute_plane_cols(ps, attr_cols)


def step_b(i):
    ps = front(i)
    cols = plane_cols_of(ps)
    return consume_ps(ps) + sum(jnp.sum(c) for c in cols)


def step_c(i):
    ps = front(i)
    cols = plane_cols_of(ps)
    table, a, poison = fe.stream_table_planar(ps, cols)
    # Reduce the pre-transpose stack: stream_table_planar transposes, so
    # undo it — XLA cancels .T.T and consumes the [wtot, T] stack.
    return consume_ps(ps) + jnp.sum(table.T, axis=1).sum()


def step_d(i):
    ps = front(i)
    cols = plane_cols_of(ps)
    table, a, poison = fe.stream_table_planar(ps, cols)
    return consume_ps(ps) + jnp.sum(table)


def scan16(step):
    @jax.jit
    def run(i0):
        def body(c, f):
            return c + step(i0 + f), 0
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(FRAMES, dtype=jnp.int32))
        return c
    return run


for name, step in [("A planar_front only", step_a),
                   ("B + plane cols", step_b),
                   ("C + stack (no T)", step_c),
                   ("D + transpose (prod)", step_d)]:
    r = bench_frame(scan16(step), lambda i: (jnp.int32(i * FRAMES),),
                    name=name, frames_per_call=FRAMES, iters=ITERS)
    print(f"{name:>22}: {r.p50_ms:7.3f} ms/frame  compile {r.compile_s:.1f}s",
          flush=True)
