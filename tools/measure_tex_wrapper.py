#!/usr/bin/env python
"""Measure the segment-compacted bilinear sampler vs the plain full-frame
quad gather at 1080p (config4-like clustered ~25% coverage), plus the
fallback-path overhead when coverage exceeds cap.

Run on TPU: nohup python tools/measure_tex_wrapper.py > /tmp/texwrap.log &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from software_renderer_tpu.ops.texture import (  # noqa: E402
    Texture, sample_texture_planes, sample_texture_planes_compacted)

H, W = 1080, 1920
TH = TW = 256
N = 8

rng = np.random.default_rng(0)
tex = Texture(data=jnp.asarray(rng.random((TH, TW, 3), np.float32)))
yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
u = xx * 4.0 / TW
v = yy * 4.0 / TH
# Clustered coverage ~25% of pixels -> ~30% of 128-segments (config4-ish):
# vertical bands of covered columns.
covered = jnp.asarray(
    (rng.random((H, W)) < 0.7)
    & ((np.arange(W)[None, :] // 128) % 3 == 0))
print("pixel coverage", float(jnp.mean(covered)),
      "seg coverage", float(jnp.mean(jnp.any(
          covered.reshape(H * W // 128, 128), axis=1))), flush=True)
dense = jnp.asarray(rng.random((H, W)) < 0.9)


def scanbench(fn, *args):
    @jax.jit
    def run(a):
        def body(c, x):
            outs = fn(*[ai + x * 0 if ai.dtype != jnp.bool_ else ai
                        for ai in a])
            return c + sum(jnp.sum(o) for o in outs), 0.0

        return jax.lax.scan(body, 0.0, jnp.arange(N, dtype=jnp.float32))[0]

    r = run(args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / N * 1e3


plain = scanbench(lambda uu, vv: sample_texture_planes(tex, uu, vv), u, v)
print(f"plain quad gather            : {plain:7.3f} ms/frame", flush=True)
for cf in (0.35, 0.45, 0.6):
    t = scanbench(
        lambda uu, vv, c, cf=cf: sample_texture_planes_compacted(
            tex, uu, vv, c, cap_frac=cf),
        u, v, covered)
    print(f"compacted cap={cf:4.2f} (engaged) : {t:7.3f} ms/frame",
          flush=True)
t = scanbench(
    lambda uu, vv, c: sample_texture_planes_compacted(tex, uu, vv, c,
                                                      cap_frac=0.45),
    u, v, dense)
print(f"compacted cap=0.45 (fallbk)  : {t:7.3f} ms/frame", flush=True)
