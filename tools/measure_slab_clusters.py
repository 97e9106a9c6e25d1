#!/usr/bin/env python
"""Distinct 8-row texel slabs per compacted segment across the config4
animation — the go/no-go for the slab-LIST windowed sampler redesign.

tools/measure_ya_spread.py killed the contiguous-window design: mean
per-segment ya SPREAD is 120-200 rows (a 1x128 screen segment crosses
many small objects with unrelated UVs), so a min-row window sweep runs
~25 iterations/segment. But spread is not cluster count: if the 128
lanes hit only a handful of DISTINCT 8-row slabs (one or two per object
crossed), a per-segment slab-id list lets the kernel loop over exactly
the slabs that matter. This measures that count's distribution, plus
the sum over segments (= total kernel window iterations per frame).

Usage: nohup python tools/measure_slab_clusters.py > /tmp/slabs.log 2>&1 &
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
from software_renderer_tpu.ops import frontend as fe
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.binning import fused_pipeline
from software_renderer_tpu.ops.shading import shading_params

W, H = 1920, 1080
TH = 256
K = 128
rp = scenes.config4_many_objects(0.0, width=W, height=H)
mesh = rp.mesh
tris = mesh.triangles()
corners = mesh.positions[tris]
uv_cols = fe.attr_corner_cols(mesh.uvs[tris])
params = shading_params(None)
BIG = 10 ** 6


@jax.jit
def slab_stats(time):
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), time)
    transform = rp.transform @ tf.rotation_matrix(q)
    ps = fe.planar_front(fe.corner_cols(corners), transform, W, H,
                         cull_backfaces=True)
    _, tri_id, out = fused_pipeline(
        ps, list(uv_cols), params, width=W, height=H,
        epilogue=lambda planes, covered, p: list(planes), n_out=2,
        pair_budget_factor=0.85)
    v = out[1]
    covered = tri_id != -1
    ya = jnp.mod(jnp.floor(v * TH - 0.5).astype(jnp.int32), TH)

    ns = H * W // K
    cov = covered.reshape(ns, K)
    seg_cov = jnp.any(cov, axis=1)
    n_cov = jnp.sum(seg_cov.astype(jnp.float32))

    def distinct(gran):
        slab = jnp.where(cov, ya.reshape(ns, K) // gran, BIG)
        s = jnp.sort(slab, axis=1)
        new = jnp.concatenate(
            [(s[:, :1] != BIG).astype(jnp.int32),
             ((s[:, 1:] != s[:, :-1]) & (s[:, 1:] != BIG)).astype(
                 jnp.int32)], axis=1)
        return jnp.sum(new, axis=1)  # [ns] distinct slab count

    out_stats = []
    for gran in (8, 16):
        d = distinct(gran)
        mean_d = jnp.sum(d.astype(jnp.float32)) / n_cov
        total = jnp.sum(d.astype(jnp.float32))
        fr = [jnp.sum(((d <= k) & seg_cov).astype(jnp.float32)) / n_cov
              for k in (1, 2, 3, 4, 6, 8, 12, 16)]
        out_stats.append((mean_d, total, fr))
    return n_cov, out_stats


for i in range(0, 704, 64):
    t = i / 60.0
    n_cov, stats = slab_stats(jnp.float32(t))
    for gran, (mean_d, total, fr) in zip((8, 16), stats):
        fr = " ".join(f"{float(x):.3f}" for x in fr)
        print(f"t={t:5.2f} gran {gran:2d}: segs {float(n_cov):7.0f} "
              f"mean distinct {float(mean_d):5.2f} total {float(total):8.0f}"
              f" | <=1/2/3/4/6/8/12/16: {fr}", flush=True)
print("done")
