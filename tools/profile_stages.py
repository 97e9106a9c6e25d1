#!/usr/bin/env python
"""Per-stage timing of the binned pipeline on real TPU hardware.

Times cumulative prefixes of the pipeline (vertex/setup -> bins -> stream
gather -> visibility -> resolve -> shading) on the config-4 scene; stage
costs are adjacent differences. Every measurement scans FRAMES frames
inside one jit with a fresh per-frame rotation (no constant folding) and
consumes outputs with full reductions (no DCE).

Knobs (env): PROF_TRIS, PROF_W, PROF_H, PROF_FRAMES, PROF_ITERS,
PROF_TILE_H, PROF_TILE_W, PROF_CHUNK, PROF_KMAX, PROF_STAGES (csv).

Usage: nohup python tools/profile_stages.py > /tmp/profile.log 2>&1 &
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.binning import (
    binned_pipeline, build_bins, build_stream_table, gather_stream)
from software_renderer_tpu.ops.setup import triangle_setup_from_corners
from software_renderer_tpu.ops.shading import (
    gather_attribute_values, shade_gbuffer)
from software_renderer_tpu.ops.vertex import corner_stage

W = int(os.environ.get("PROF_W", "1920"))
H = int(os.environ.get("PROF_H", "1080"))
TRIS = int(os.environ.get("PROF_TRIS", "100000"))
FRAMES = int(os.environ.get("PROF_FRAMES", "16"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))
TILE_H = int(os.environ.get("PROF_TILE_H", "0")) or None
TILE_W = int(os.environ.get("PROF_TILE_W", "0")) or None
CHUNK = int(os.environ.get("PROF_CHUNK", "0")) or None
KMAX = int(os.environ.get("PROF_KMAX", "0")) or None
BUDGET = float(os.environ.get("PROF_BUDGET", "0")) or None
BANDS = int(os.environ.get("PROF_BANDS", "0")) or None
GLEN = int(os.environ.get("PROF_GLEN", "0")) or None
STATIC_GRID = os.environ.get("PROF_STATIC_GRID", "0") == "1"
TEXTURED = os.environ.get("PROF_TEXTURED", "1") != "0"

rp = scenes.config4_many_objects(0.0, width=W, height=H, triangles=TRIS,
                                 textured=TEXTURED)
mesh = rp.mesh
tris = mesh.triangles()
corners = mesh.positions[tris]
n_tris = int(tris.shape[0])

kw = {}
if TILE_H:
    kw["tile_h"] = TILE_H
if TILE_W:
    kw["tile_w"] = TILE_W
if CHUNK:
    kw["chunk"] = CHUNK
if KMAX:
    kw["kmax"] = KMAX
if BUDGET:
    kw["pair_budget_factor"] = BUDGET
if BANDS:
    kw["bands"] = BANDS
if GLEN:
    kw["glen"] = GLEN
if STATIC_GRID:
    kw["permute"] = False


def transform_of(i):
    t = i.astype(jnp.float32) * (1.0 / 60.0)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
    return rp.transform @ tf.rotation_matrix(q)


def setup_of(i):
    screen_c, w_c = corner_stage(corners, transform_of(i), W, H)
    return triangle_setup_from_corners(screen_c, W, H,
                                       cull_backfaces=rp.cull_backfaces)


def stage_setup(i):
    s = setup_of(i)
    return (jnp.sum(s.coef) + jnp.sum(s.zplane) + jnp.sum(s.bbox)
            + jnp.sum(s.valid))


def stage_bins(i):
    s = setup_of(i)
    info = build_bins(s, width=W, height=H, **kw)
    return (jnp.sum(info.ids) + jnp.sum(info.chunk_tile)
            + jnp.sum(info.live_flag) + info.n_overflow)


def _attrs(s):
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
        uvs=mesh.uvs, has_light=rp.light is not None)
    return attrs, chans


def stage_stream(i):
    s = setup_of(i)
    info = build_bins(s, width=W, height=H, **kw)
    attrs, _ = _attrs(s)
    table, a, poison = build_stream_table(s, attrs)
    stream = gather_stream(table, info.ids, poison)
    return jnp.sum(stream)


def stage_visibility(i):
    s = setup_of(i)
    depth, tid, _ = binned_pipeline(s, None, width=W, height=H, **kw)
    return jnp.sum(jnp.where(jnp.isfinite(depth), depth, 0.0)) + jnp.sum(tid)


def stage_resolve(i):
    s = setup_of(i)
    attrs, chans = _attrs(s)
    depth, tid, gb = binned_pipeline(s, attrs, width=W, height=H, **kw)
    return (jnp.sum(jnp.where(jnp.isfinite(depth), depth, 0.0))
            + jnp.sum(tid) + jnp.sum(gb))


def stage_full(i):
    s = setup_of(i)
    attrs, chans = _attrs(s)
    depth, tid, gb = binned_pipeline(s, attrs, width=W, height=H, **kw)
    normal_matrix = None
    if rp.model is not None:
        normal_matrix = jnp.linalg.inv(rp.model[:3, :3]).T.astype(jnp.float32)
    color = shade_gbuffer(gb, tid != -1, shading=rp.shading, chans=chans,
                          light=rp.light, texture=rp.texture,
                          flat_color=rp.flat_color,
                          normal_matrix=normal_matrix)
    return jnp.sum(color)


def stage_render(i):
    fb = sr.render(dataclasses.replace(rp, transform=transform_of(i)),
                   backend="binned")
    return jnp.sum(fb.color)


def _fused_parts(i, with_tail=True):
    from functools import partial
    from software_renderer_tpu.ops.binning import fused_pipeline
    from software_renderer_tpu.ops.shading import (
        finish_fused, fused_epilogue, fused_output_channels, shading_params)
    from software_renderer_tpu.ops.transforms import inverse_transpose_3x3

    s = setup_of(i)
    has_light = rp.light is not None and mesh.normals is not None
    normal_matrix = inverse_transpose_3x3(rp.model[:3, :3])
    normals = mesh.normals @ normal_matrix.T
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=normals,
        uvs=mesh.uvs, has_light=has_light)
    has_texture = rp.shading == "textured"
    out_chans = fused_output_channels(rp.shading, chans, has_light,
                                      has_texture)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epilogue = partial(fused_epilogue, chans=chans, has_light=has_light,
                       has_texture=has_texture)
    depth, tri_id, out = fused_pipeline(
        s, attrs, params, width=W, height=H, epilogue=epilogue,
        n_out=n_out, **kw)
    if with_tail is False:
        return (jnp.sum(out) + jnp.sum(tri_id)
                + jnp.sum(jnp.where(jnp.isfinite(depth), depth, 0.0)))
    color = finish_fused(
        out, tri_id != -1, out_chans=out_chans, light=rp.light,
        texture=None if with_tail == "notex" else rp.texture)
    return jnp.sum(color)


def stage_kernel(i):
    """Fused pipeline WITHOUT the XLA tail (texture gather + combine):
    isolates the Pallas kernel + binning cost."""
    return _fused_parts(i, with_tail=False)


def stage_notex(i):
    """Full fused path but with the texture gather dropped from the tail
    (combine/alpha only): fused - notex = the bilinear sample cost."""
    return _fused_parts(i, with_tail="notex")


def stage_fused(i):
    """Full fused path with the PROF_TILE_H/W, PROF_CHUNK, PROF_KMAX knobs
    (sr.render uses compiled-in defaults) — the tile-sweep stage."""
    from functools import partial
    from software_renderer_tpu.ops.binning import fused_pipeline
    from software_renderer_tpu.ops.shading import (
        finish_fused, fused_epilogue, fused_output_channels, shading_params)

    s = setup_of(i)
    has_light = rp.light is not None and mesh.normals is not None
    normal_matrix = jnp.linalg.inv(rp.model[:3, :3]).T.astype(jnp.float32)
    normals = mesh.normals @ normal_matrix.T
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=normals,
        uvs=mesh.uvs, has_light=has_light)
    has_texture = rp.shading == "textured"
    out_chans = fused_output_channels(rp.shading, chans, has_light,
                                      has_texture)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epilogue = partial(fused_epilogue, chans=chans, has_light=has_light,
                       has_texture=has_texture)
    depth, tri_id, out = fused_pipeline(
        s, attrs, params, width=W, height=H, epilogue=epilogue,
        n_out=n_out, **kw)
    color = finish_fused(out, tri_id != -1, out_chans=out_chans,
                         light=rp.light, texture=rp.texture)
    return jnp.sum(color)


def stage_vertex(i):
    """Corner transform alone (no triangle setup) — splits `setup`."""
    screen_c, w_c = corner_stage(corners, transform_of(i), W, H)
    return jnp.sum(screen_c) + jnp.sum(w_c)


def stage_planes(i):
    """Setup + attribute-plane math (no binning): isolates the [T, A, 3]
    per-channel plane construction from the rest of `stream`."""
    from software_renderer_tpu.ops.binning import attribute_planes
    s = setup_of(i)
    attrs, _ = _attrs(s)
    return jnp.sum(attribute_planes(s, attrs))


def stage_table(i):
    """Setup + full combined stream table (records + planes, concat) —
    everything per-triangle EXCEPT binning/sort/gather."""
    s = setup_of(i)
    attrs, _ = _attrs(s)
    table, a, poison = build_stream_table(s, attrs)
    return jnp.sum(table)


STAGES = [
    ("vertex", stage_vertex),
    ("setup", stage_setup),
    ("planes", stage_planes),
    ("table", stage_table),
    ("bins", stage_bins),
    ("stream", stage_stream),
    ("visibility", stage_visibility),
    ("resolve", stage_resolve),
    ("full", stage_full),
    ("render", stage_render),
    ("kernel", stage_kernel),
    ("notex", stage_notex),
    ("fused", stage_fused),
]
only = os.environ.get("PROF_STAGES")
if only:
    names = set(only.split(","))
    STAGES = [s for s in STAGES if s[0] in names]


def main():
    print(f"profile {W}x{H} {n_tris} tris, {FRAMES} frames/call, kw={kw}",
          flush=True)
    prev = 0.0
    for name, fn in STAGES:
        @jax.jit
        def run(i0, fn=fn):
            def body(carry, i):
                return carry + fn(i0 + i), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(FRAMES, dtype=jnp.int32))
            return acc

        r = bench_frame(run, lambda i: (jnp.int32(i * FRAMES),), name=name,
                        triangles=n_tris, frames_per_call=FRAMES,
                        warmup=2, iters=ITERS)
        delta = r.p50_ms - prev
        print(f"{name:>12}: {r.p50_ms:8.3f} ms/frame  (+{delta:7.3f})  "
              f"compile {r.compile_s:.1f}s", flush=True)
        prev = r.p50_ms


if __name__ == "__main__":
    main()
