#!/usr/bin/env python
"""Feasibility stats for block-gathered bilinear texturing (config 4).

For frames across the bench animation, computes the per-frame fraction of
2x2 pixel blocks whose COVERED pixels' bilinear quad anchors span more
than `win - 2` texels in x or y (the condition that would force the
full-frame quad-gather fallback), ignoring uncovered pixels.

Usage: nohup python tools/measure_uv_blocks.py > /tmp/uvblocks.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

from functools import partial

import jax
import jax.numpy as jnp

from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.binning import fused_pipeline
from software_renderer_tpu.ops.setup import triangle_setup_from_corners
from software_renderer_tpu.ops.shading import (
    fused_epilogue, fused_output_channels, gather_attribute_values,
    shading_params)
from software_renderer_tpu.ops.vertex import corner_stage

W, H = 1920, 1080
rp = scenes.config4_many_objects(0.0, width=W, height=H)
mesh = rp.mesh
tris = mesh.triangles()
corners = mesh.positions[tris]
tw = th = rp.texture.data.shape[0]


@jax.jit
def uv_stats(time):
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), time)
    transform = rp.transform @ tf.rotation_matrix(q)
    screen_c, _ = corner_stage(corners, transform, W, H)
    s = triangle_setup_from_corners(screen_c, W, H, cull_backfaces=True)
    has_light = True
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
        uvs=mesh.uvs, has_light=has_light)
    out_chans = fused_output_channels(rp.shading, chans, has_light, True)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epilogue = partial(fused_epilogue, chans=chans, has_light=has_light,
                       has_texture=True)
    depth, tri_id, out = fused_pipeline(
        s, attrs, params, width=W, height=H, epilogue=epilogue,
        n_out=n_out, pair_budget_factor=0.75)
    covered = tri_id != -1
    # uv channel offsets within out (see fused_output_channels ordering)
    off = 0
    for name, sz in out_chans:
        if name == "uv":
            break
        off += sz
    u, v = out[off], out[off + 1]
    x0 = jnp.floor(u * tw - 0.5)
    y0 = jnp.floor(v * th - 0.5)

    def frac_invalid(span):
        big = jnp.float32(1e9)

        def mm(a):
            b = a.reshape(H // 2, 2, W // 2, 2)
            cb = covered.reshape(H // 2, 2, W // 2, 2)
            amin = jnp.min(jnp.where(cb, b, big), axis=(1, 3))
            amax = jnp.max(jnp.where(cb, b, -big), axis=(1, 3))
            return amax - amin

        bad = (mm(x0) > span) | (mm(y0) > span)
        return jnp.mean(bad.astype(jnp.float32)), jnp.sum(bad)

    f2, n2 = frac_invalid(2.0)   # 4x4 texel window (48 lanes, C=3)
    f4, n4 = frac_invalid(4.0)   # 6x6 texel window (108 lanes, C=3)

    def block_cov(bsz):
        cb = covered.reshape(H // bsz, bsz, W // bsz, bsz)
        return jnp.mean(jnp.any(cb, axis=(1, 3)).astype(jnp.float32))

    return (f2, n2, f4, n4, jnp.mean(covered.astype(jnp.float32)),
            block_cov(2), block_cov(4), block_cov(8))


for i in range(0, 80, 5):
    t = i / 60.0
    (f2, n2, f4, n4, cov, bc2, bc4, bc8) = [
        float(x) for x in uv_stats(jnp.float32(t))]
    print(f"t={t:5.2f}: cov {cov:.3f} | bad 4x4 win: {f2 * 100:7.3f}% "
          f"({int(n2)}) | bad 6x6 win: {f4 * 100:7.3f}% ({int(n4)}) | "
          f"blockcov 2/4/8: {bc2:.3f} {bc4:.3f} {bc8:.3f}",
          flush=True)
print("done")
