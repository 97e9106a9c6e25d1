#!/usr/bin/env python
"""Per-segment texel-row (ya) spread across the config4 animation —
sizing data for the windowed dynamic-gather texture sampler
(tools/probe_dyngather.py, PERF.md backlog #2).

The windowed sampler slices a [WIN, tw] window of the VMEM-resident
texture at each compacted 1x128 segment's min covered texel row and
per-lane-gathers inside it; segments whose covered ya spread exceeds
WIN-1 need extra window iterations (or the XLA fallback). This measures
the spread distribution: if e.g. 95% of covered segments fit WIN=8 and
99.9% fit two windows, the sampler's data-dependent window loop runs
~1.05 iterations per segment on the bench scene.

Spread is reported both wrapped (mod th — what the sampler sees) and
unwrapped (is the tail purely the v=1->0 seam?).

Usage: nohup python tools/measure_ya_spread.py > /tmp/yaspread.log 2>&1 &
"""
import functools
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


@jax.jit
def spread_stats(time):
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
    # Same index math as the sampler: y = v*th - 0.5; ya = mod(floor(y)).
    yf = jnp.floor(v * TH - 0.5)
    ya = jnp.mod(yf.astype(jnp.int32), TH)

    ns = H * W // K
    cov = covered.reshape(ns, K)
    seg_cov = jnp.any(cov, axis=1)

    def seg_spread(rows):
        r = rows.reshape(ns, K)
        lo = jnp.min(jnp.where(cov, r, 10 ** 6), axis=1)
        hi = jnp.max(jnp.where(cov, r, -(10 ** 6)), axis=1)
        return jnp.where(seg_cov, hi - lo, 0)

    sp_w = seg_spread(ya)
    sp_u = seg_spread(yf.astype(jnp.int32))
    n_cov = jnp.sum(seg_cov.astype(jnp.float32))

    def frac_le(sp, k):
        return jnp.sum(((sp <= k) & seg_cov).astype(jnp.float32)) / n_cov

    ks = [6, 7, 14, 15, 30, 62, 126]
    return (n_cov, jnp.mean(sp_w * seg_cov.astype(jnp.int32)) * ns / n_cov,
            [frac_le(sp_w, k) for k in ks],
            [frac_le(sp_u, k) for k in ks])


for i in range(0, 704, 64):
    t = i / 60.0
    n_cov, mean_w, fw, fu = spread_stats(jnp.float32(t))
    fw = " ".join(f"{float(x):.4f}" for x in fw)
    fu = " ".join(f"{float(x):.4f}" for x in fu)
    print(f"t={t:5.2f}: segs {float(n_cov):7.0f} mean {float(mean_w):6.2f}"
          f" | wrapped <=6/7/14/15/30/62/126: {fw}\n"
          f"         unwrapped:                   {fu}", flush=True)
print("done")
