"""Cap-sweep of the segment-compacted bilinear sampler at 1080p: per-cap
cost with coverage held fixed, to size the tier ladder (slope = ms per
cap fraction, intercept = fixed compaction cost).

Run on TPU: nohup python tools/measure_tex_caps.py > /tmp/texcaps.log &
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
N = 16

rng = np.random.default_rng(0)
tex = Texture(data=jnp.asarray(rng.random((256, 256, 3), np.float32)))
yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
u = xx * 4.0 / 256
v = yy * 4.0 / 256
covered = jnp.asarray(
    (rng.random((H, W)) < 0.7)
    & ((np.arange(W)[None, :] // 128) % 3 == 0))
print("pixel coverage", float(jnp.mean(covered)), flush=True)


def run(fn):
    @jax.jit
    def step(u0):
        def body(c, i):
            outs = fn(u + u0 * (1.0 + 0.0001 * i), v)
            return c + sum(jnp.sum(o) for o in outs), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N, dtype=jnp.float32))
        return acc

    jax.block_until_ready(step(jnp.float32(0.0)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(step(jnp.float32(i * 1e-5)))
        ts.append((time.perf_counter() - t0) / N * 1e3)
    return float(np.median(ts))


t_plain = run(lambda uu, vv: sample_texture_planes(tex, uu, vv))
print(f"plain full-frame gather: {t_plain:7.3f} ms", flush=True)

for cap in (0.20, 0.25, 0.30, 0.35, 0.40, 0.45, 0.50, 0.60):
    t = run(lambda uu, vv, c=cap: sample_texture_planes_compacted(
        tex, uu, vv, covered, cap_fracs=(c,)))
    print(f"cap {cap:4.2f}: {t:7.3f} ms", flush=True)
