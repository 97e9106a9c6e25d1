#!/usr/bin/env python
"""Microbench: planar (structure-of-arrays) front-end vs current.

The current vertex+setup+table front-end costs ~3.5 ms/frame at 100k
triangles (tools/profile_stages.py). Hypothesis: it is layout-bound, not
flop- or bandwidth-bound — every intermediate is a [T, 3] / [T, 3, 3] /
[T, 4] array whose minor dim the TPU pads to 128 lanes, so each
elementwise op is a ~40x-padded relayout. The planar variant keeps every
per-triangle quantity a separate [T] array (wide, lane-aligned), does the
4x4 transform as 12 scalar FMAs on [T] arrays (VPU, exact f32), and
builds the [T, wtot] stream table with ONE [wtot, T] major-dim concat +
one transpose at the very end.

Stages:
  A. current corner_stage + triangle_setup_from_corners + table concat
  B. planar everything + final [wtot, T] -> [T, wtot] transpose
  C. planar, no final transpose (isolates the transpose cost)

Usage: nohup python tools/microbench_planar.py > /tmp/mb_planar.log 2>&1 &
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
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.setup import triangle_setup_from_corners
from software_renderer_tpu.ops.vertex import corner_stage, round_half_away
from software_renderer_tpu.ops.binning import build_stream_table

W, H = 1920, 1080
TRIS = 100000
FRAMES = 16
ITERS = int(os.environ.get("MB_ITERS", "8"))

rp = scenes.config4_many_objects(0.0, width=W, height=H, triangles=TRIS)
mesh = rp.mesh
tris = mesh.triangles()
corners0 = mesh.positions[tris]              # [T, 3c, 3xyz] model space
corners_p0 = jnp.asarray(corners0).transpose(1, 2, 0)  # [3c, 3xyz, T] planar
T = int(corners0.shape[0])
# Per-vertex attrs (uv 2 + normal 3 = 5 channels as in config4's fused path)
uvs = mesh.uvs[tris] if mesh.uvs is not None else jnp.zeros((T, 3, 2))
nrm = mesh.normals[tris] if mesh.normals is not None else jnp.zeros((T, 3, 3))
attrs0 = jnp.concatenate([uvs, nrm], axis=-1)          # [T, 3, 5]
attrs_p0 = attrs0.transpose(1, 2, 0)                   # [3, 5, T]
A = int(attrs0.shape[-1])


def transform_of(i):
    t = i.astype(jnp.float32) * (1.0 / 60.0)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
    return rp.transform @ tf.rotation_matrix(q)


def step_current(i):
    m = transform_of(i)
    screen_c, _ = corner_stage(corners0, m, W, H)
    s = triangle_setup_from_corners(screen_c, W, H,
                                    cull_backfaces=rp.cull_backfaces)
    table, _, _ = build_stream_table(s, attrs0)
    return (jnp.sum(table) + jnp.sum(s.bbox).astype(jnp.float32)
            + jnp.sum(s.valid))


def planar_front(i, *, transpose: bool):
    m = transform_of(i)
    # --- vertex: 4x4 transform + divide + NDC->pixel, all on [T] arrays ---
    sx, sy = [], []
    zs = []
    for c in range(3):
        X, Y, Z = (corners_p0[c, 0], corners_p0[c, 1], corners_p0[c, 2])
        cx = m[0, 0] * X + m[0, 1] * Y + m[0, 2] * Z + m[0, 3]
        cy = m[1, 0] * X + m[1, 1] * Y + m[1, 2] * Z + m[1, 3]
        cz = m[2, 0] * X + m[2, 1] * Y + m[2, 2] * Z + m[2, 3]
        cw = m[3, 0] * X + m[3, 1] * Y + m[3, 2] * Z + m[3, 3]
        inv_w = 1.0 / cw
        u = (cx * inv_w) * 0.5 + 0.5
        v = (cy * inv_w) * -0.5 + 0.5
        sx.append(round_half_away(u * W))
        sy.append(round_half_away(v * H))
        zs.append(cz * inv_w)
    x1, x2, x3 = sx
    y1, y2, y3 = sy
    z1, z2, z3 = zs
    # --- setup (same exact formulas as ops/setup.py) ---
    d = (x1 - x3) * (y2 - y3) - (x2 - x3) * (y1 - y3)
    finite = (jnp.isfinite(x1) & jnp.isfinite(y1) & jnp.isfinite(z1)
              & jnp.isfinite(x2) & jnp.isfinite(y2) & jnp.isfinite(z2)
              & jnp.isfinite(x3) & jnp.isfinite(y3) & jnp.isfinite(z3))
    degenerate = ~finite | (d == 0.0)
    s_ = jnp.where(d < 0.0, -1.0, 1.0)
    abs_d = jnp.abs(d)
    inv_area = jnp.where(degenerate, 0.0,
                         1.0 / jnp.where(degenerate, 1.0, abs_d))
    a0 = (y2 - y3) * s_
    b0 = (x3 - x2) * s_
    a1 = (y3 - y1) * s_
    b1 = (x1 - x3) * s_
    c0 = -(a0 * x3 + b0 * y3)
    c1 = -(a1 * x3 + b1 * y3)
    a2 = -(a0 + a1)
    b2 = -(b0 + b1)
    c2 = abs_d - c0 - c1
    zpx = (a0 * z1 + a1 * z2 + a2 * z3) * inv_area
    zpy = (b0 * z1 + b1 * z2 + b2 * z3) * inv_area
    zpc = (c0 * z1 + c1 * z2 + c2 * z3) * inv_area
    min_x = jnp.minimum(jnp.minimum(x1, x2), x3)
    max_x = jnp.maximum(jnp.maximum(x1, x2), x3)
    min_y = jnp.minimum(jnp.minimum(y1, y2), y3)
    max_y = jnp.maximum(jnp.maximum(y1, y2), y3)
    offscreen = ((max_x < 0.0) | (min_x > W) | (max_y < 0.0) | (min_y > H))
    clean = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
    bx0 = jnp.clip(clean(jnp.floor(min_x)), 0, W - 1).astype(jnp.int32)
    by0 = jnp.clip(clean(jnp.floor(min_y)), 0, H - 1).astype(jnp.int32)
    bx1 = jnp.clip(clean(jnp.ceil(max_x)), 0, W - 1).astype(jnp.int32)
    by1 = jnp.clip(clean(jnp.ceil(max_y)), 0, H - 1).astype(jnp.int32)
    valid = ~degenerate & ~offscreen
    if rp.cull_backfaces:
        valid = valid & (d > 0.0)
    # invalid fill (match setup.py): e const -1, z +inf
    c0 = jnp.where(valid, c0, -1.0)
    c1 = jnp.where(valid, c1, -1.0)
    zpc = jnp.where(valid, zpc, jnp.inf)
    zpx = jnp.where(valid, zpx, 0.0)
    zpy = jnp.where(valid, zpy, 0.0)
    inv_area = jnp.where(valid, inv_area, 0.0)
    abs_dv = abs_d * valid
    # --- attribute planes: plane_a = (e-coef . attr_vals) * inv_area ---
    plane_cols = []
    for a in range(A):
        v1, v2, v3 = attrs_p0[0, a], attrs_p0[1, a], attrs_p0[2, a]
        plane_cols += [
            (a0 * v1 + a1 * v2 + a2 * v3) * inv_area,
            (b0 * v1 + b1 * v2 + b2 * v3) * inv_area,
            (c0 * v1 + c1 * v2 + c2 * v3) * inv_area,
        ]
    ids = jnp.arange(T, dtype=jnp.float32)
    ids = jnp.where(valid, ids, -1.0)
    cols = [a0, a1, b0, b1,
            jnp.where(valid, c0, -1.0), jnp.where(valid, c1, -1.0),
            abs_dv, zpx, zpy, zpc, ids] + plane_cols
    table_t = jnp.stack(cols, axis=0)  # [wtot, T] — major concat, planar
    if transpose:
        table = table_t.T  # ONE relayout at the very end
        acc = jnp.sum(table)
    else:
        acc = jnp.sum(table_t)
    return (acc + jnp.sum(bx0 + by0 + bx1 + by1).astype(jnp.float32)
            + jnp.sum(valid))


def scan16(step):
    @jax.jit
    def run(i0):
        def body(c, f):
            return c + step(i0 + f), 0
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(FRAMES, dtype=jnp.int32))
        return c
    return run


import functools
for name, step in [
        ("A current front-end", step_current),
        ("B planar + transpose", functools.partial(planar_front,
                                                   transpose=True)),
        ("C planar no-transpose", functools.partial(planar_front,
                                                    transpose=False))]:
    r = bench_frame(scan16(step), lambda i: (jnp.int32(i * FRAMES),),
                    name=name, frames_per_call=FRAMES, iters=ITERS)
    print(f"{name:>22}: {r.p50_ms:7.3f} ms/frame  compile {r.compile_s:.1f}s",
          flush=True)
