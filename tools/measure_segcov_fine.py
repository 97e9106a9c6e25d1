#!/usr/bin/env python
"""Fine-grained (every-8-frames) s128 segment coverage over the FULL
bench animation (t = i/60, i in [0, 704)) — tier-sizing data for the
compacted texture sampler's cap_fracs chain.

Usage: nohup python tools/measure_segcov_fine.py > /tmp/segcov_fine.log 2>&1 &
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
def s128_cov(time):
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), time)
    transform = rp.transform @ tf.rotation_matrix(q)
    screen_c, _ = corner_stage(corners, transform, W, H)
    s = triangle_setup_from_corners(screen_c, W, H, cull_backfaces=True)
    depth, tri_id, _ = binned_pipeline(s, None, width=W, height=H,
                                       pair_budget_factor=0.75)
    covered = tri_id != -1
    cb = covered.reshape(H * W // 128, 128)
    return jnp.mean(jnp.any(cb, axis=1).astype(jnp.float32))


vals = []
for i in range(0, 704, 8):
    c = float(s128_cov(jnp.float32(i / 60.0)))
    vals.append(c)
    print(f"i={i:4d} t={i / 60.0:6.3f} s128={c:.4f}", flush=True)

import numpy as np

v = np.array(vals)
print("\nhistogram of s128 coverage over the bench animation:")
for lo, hi in [(0.0, 0.22), (0.22, 0.28), (0.28, 0.35), (0.35, 0.45),
               (0.45, 0.60), (0.60, 1.01)]:
    frac = np.mean((v >= lo) & (v < hi))
    print(f"  [{lo:.2f}, {hi:.2f}): {frac * 100:5.1f}% of frames")
print(f"min={v.min():.4f} p50={np.percentile(v, 50):.4f} max={v.max():.4f}")
