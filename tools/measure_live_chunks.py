#!/usr/bin/env python
"""Live-chunk fraction (n_live / n_chunks) of the banded binned layout
over the full bench animation — tier-sizing data for the permuted
stream-gather's STREAM_TIERS chain (ops/binning.py).

Usage: nohup python tools/measure_live_chunks.py > /tmp/live_chunks.log 2>&1 &
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
from software_renderer_tpu.ops.binning import (
    FUSED_BANDS, FUSED_CHUNK, FUSED_GLEN, KMAX, build_bins,
    live_first_permutation)
from software_renderer_tpu.ops.frontend import corner_cols, planar_front

W, H = 1920, 1080
rp = scenes.config4_many_objects(0.0, width=W, height=H)
mesh = rp.mesh
tris = mesh.triangles()
corners = mesh.positions[tris]
BUDGET = 0.85  # render.py production banded budget


@jax.jit
def live_frac(time):
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), time)
    transform = rp.transform @ tf.rotation_matrix(q)
    s = planar_front(corner_cols(corners), transform, W, H,
                     cull_backfaces=True)
    info = build_bins(s, width=W, height=H, chunk=FUSED_CHUNK,
                      kmax=KMAX * FUSED_BANDS, bands=FUSED_BANDS,
                      glen=FUSED_GLEN, pair_budget_factor=BUDGET)
    _, n_live = live_first_permutation(info.live_flag)
    return n_live, info.live_flag.shape[0]


vals = []
for i in range(0, 704, 8):
    n, total = live_frac(jnp.float32(i / 60.0))
    f = float(n) / total
    vals.append(f)
    print(f"i={i:4d} t={i / 60.0:6.3f} live={int(n):5d}/{total} "
          f"frac={f:.4f}", flush=True)

import numpy as np

v = np.array(vals)
print("\nhistogram of live-chunk fraction over the bench animation:")
for lo, hi in [(0.0, 0.3), (0.3, 0.4), (0.4, 0.5), (0.5, 0.6),
               (0.6, 0.7), (0.7, 0.85), (0.85, 1.01)]:
    frac = np.mean((v >= lo) & (v < hi))
    print(f"  [{lo:.2f}, {hi:.2f}): {frac * 100:5.1f}% of frames")
print(f"min={v.min():.4f} p50={np.percentile(v, 50):.4f} max={v.max():.4f}")
