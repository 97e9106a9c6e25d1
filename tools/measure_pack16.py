#!/usr/bin/env python
"""A/B the PRODUCTION compacted sampler under quad-table packs — the
isolated supertile line won 4.23 vs 6.68 ms (tools/measure_supertile.py)
but the full bench REGRESSED 11.8 -> 15.2 ms; this isolates where the
in-graph cost appears (tier chain + table build + scatter-back, exactly
the production call).

Usage: python tools/measure_pack16.py   (axon TPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from software_renderer_tpu.ops import texture as tex_mod

H, W = 1080, 1920
TH = TW = 256
N_SCAN = 8

rng = np.random.default_rng(0)
tex = tex_mod.Texture(data=jnp.asarray(rng.random((TH, TW, 3), np.float32)))
# UV-incoherent (config4-like): random uv per pixel.
u = jnp.asarray(rng.random((H, W), np.float32))
v = jnp.asarray(rng.random((H, W), np.float32))
covered = jnp.asarray(
    (rng.random((H, W)) < 0.7)
    & ((np.arange(W)[None, :] // 128) % 3 == 0))
print("seg coverage", float(jnp.mean(jnp.any(
    covered.reshape(H * W // 128, 128), axis=1))), flush=True)


def timed(name, fn):
    @jax.jit
    def run(i0, uu, vv):
        def body(carry, i):
            outs = fn(uu + 0.0 * (i0 + i), vv)
            return carry + sum(jnp.sum(o) for o in outs), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N_SCAN, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.float32(i), u, v), name=name,
                    frames_per_call=N_SCAN, warmup=2, iters=8)
    print(f"{name:>44}: {r.p50_ms:8.3f} ms", flush=True)
    return r.p50_ms


for pack in (1, 16):
    tex_mod.TEX_TABLE_PACK = pack
    timed(f"compacted tier chain, pack {pack:>2}",
          lambda uu, vv: tex_mod.sample_texture_planes_compacted(
              tex, uu, vv, covered))
    timed(f"full-frame planes,    pack {pack:>2}",
          lambda uu, vv: tex_mod.sample_texture_planes(tex, uu, vv))

# ---- hypothesis: the in-graph table build is the regression ----------
# Precompute both tables eagerly and monkeypatch the builders to return
# the constants; if pack 16 now wins, production needs table caching.
const_tabs = {}
tex_mod.TEX_TABLE_PACK = 16
const_tabs[16] = jax.device_get(tex_mod._packed_quad_table(tex, 16))
const_tabs[16] = jnp.asarray(const_tabs[16])
const_tabs[1] = jnp.asarray(jax.device_get(tex_mod._quad_table(tex)))

orig_packed = tex_mod._packed_quad_table
orig_quad = tex_mod._quad_table
tex_mod._packed_quad_table = lambda t, p: const_tabs[p]
tex_mod._quad_table = lambda t: const_tabs[1]
for pack in (1, 16):
    tex_mod.TEX_TABLE_PACK = pack
    timed(f"compacted tier, CONST table, pack {pack:>2}",
          lambda uu, vv: tex_mod.sample_texture_planes_compacted(
              tex, uu, vv, covered))
tex_mod._packed_quad_table = orig_packed
tex_mod._quad_table = orig_quad
