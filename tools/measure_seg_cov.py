#!/usr/bin/env python
"""Covered fraction of row segments (1 x K pixel strips) vs square blocks
across the config4 animation — sizing data for segment-compacted texture
sampling (blockify of 1 x K segments is a pure reshape: no relayout).

Usage: nohup python tools/measure_seg_cov.py > /tmp/segcov.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.binning import binned_pipeline
from software_renderer_tpu.ops.setup import triangle_setup_from_corners
from software_renderer_tpu.ops.vertex import corner_stage

W, H = 1920, 1080
rp = scenes.config4_many_objects(0.0, width=W, height=H)
mesh = rp.mesh
tris = mesh.triangles()
corners = mesh.positions[tris]


@jax.jit
def seg_stats(time):
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), time)
    transform = rp.transform @ tf.rotation_matrix(q)
    screen_c, _ = corner_stage(corners, transform, W, H)
    s = triangle_setup_from_corners(screen_c, W, H, cull_backfaces=True)
    depth, tri_id, _ = binned_pipeline(s, None, width=W, height=H,
                                       pair_budget_factor=0.75)
    covered = tri_id != -1

    def seg_cov(k):
        cb = covered.reshape(H * W // k, k)
        return jnp.mean(jnp.any(cb, axis=1).astype(jnp.float32))

    def blk_cov(by, bx):
        cb = covered.reshape(H // by, by, W // bx, bx)
        return jnp.mean(jnp.any(cb, axis=(1, 3)).astype(jnp.float32))

    return (jnp.mean(covered.astype(jnp.float32)),
            seg_cov(32), seg_cov(64), seg_cov(128), seg_cov(256),
            blk_cov(4, 4), blk_cov(8, 128))


for i in range(0, 704, 32):
    t = i / 60.0
    cov, s32, s64, s128, s256, b44, b8128 = [
        float(x) for x in seg_stats(jnp.float32(t))]
    print(f"t={t:5.2f}: pix {cov:.3f} | seg 32/64/128/256: "
          f"{s32:.3f} {s64:.3f} {s128:.3f} {s256:.3f} | "
          f"4x4 {b44:.3f} | 8x128 {b8128:.3f}", flush=True)
print("done")
