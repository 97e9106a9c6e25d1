#!/usr/bin/env python
"""Layout experiments for the compacted bilinear sampler's post-gather math.

The quad gather emits [cap, K, 12] — a narrow-minor (12 << 128 lanes)
tensor; every channel slice + lerp op on it pays a padded relayout. Three
candidate rewrites, all numerically IDENTICAL per covered pixel (same lerp
expression, same association):

  A current   : slice 12 channels out of [cap, K, 12], lerp per channel
  B transpose : one [capK, 12] -> [12, capK] transpose after the gather,
                then all lerps on full-lane-width [cap, K] planes
  C grouped   : reshape [cap, K, 4, 3] * w[cap, K, 4, 1] -> sum(axis=2)
                (one fused multiply-reduce instead of 12 slices + 9 ops)

Run on TPU: nohup python tools/microbench_texlayout.py > /tmp/texlayout.log &
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
    COMPACT_SEG, Texture, _quad_table, _segment_ranks, _comp_seg_for_cap,
    _wrap_coords)

H, W = 1080, 1920
TH = TW = 256
N = 8
CAP_FRAC = 0.35

rng = np.random.default_rng(0)
tex = Texture(data=jnp.asarray(rng.random((TH, TW, 3), np.float32)))
yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
u = xx * 4.0 / TW
v = yy * 4.0 / TH
covered = jnp.asarray(
    (rng.random((H, W)) < 0.7)
    & ((np.arange(W)[None, :] // 128) % 3 == 0))
K = COMPACT_SEG
NS = H * W // K
CAP = -(-int(CAP_FRAC * NS) // 8) * 8
print("seg coverage", float(jnp.mean(jnp.any(
    covered.reshape(NS, K), axis=1))), "cap", CAP, flush=True)


def _common(uu, vv, cov):
    th, tw, c = tex.data.shape
    x = uu * tw - 0.5
    y = vv * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xa = _wrap_coords(x0.astype(jnp.int32), tw, tex.wrap)
    ya = _wrap_coords(y0.astype(jnp.int32), th, tex.wrap)
    idx = (ya * tw + xa).reshape(NS, K)
    scov = jnp.any(cov.reshape(NS, K), axis=1)
    lc, off, slot, n_cov = _segment_ranks(scov)
    comp_seg = _comp_seg_for_cap(lc, off, CAP, NS)
    sloti = jnp.clip(slot, 0.0, CAP - 1).astype(jnp.int32)
    ci = idx[comp_seg]
    cfx = fx.reshape(NS, K)[comp_seg]
    cfy = fy.reshape(NS, K)[comp_seg]
    return ci, cfx, cfy, sloti


def _place(chans, sloti):
    comp = jnp.concatenate(chans, axis=1)
    full = comp[sloti]
    return [full[:, i * K:(i + 1) * K].reshape(H, W) for i in range(3)]


def variant_a(uu, vv, cov):
    c = 3
    ci, cfx, cfy, sloti = _common(uu, vv, cov)
    quad = _quad_table(tex)[ci].astype(jnp.float32)  # [cap, K, 12]
    chans = []
    for i in range(c):
        t00 = quad[..., i]
        t01 = quad[..., c + i]
        t10 = quad[..., 2 * c + i]
        t11 = quad[..., 3 * c + i]
        top = t00 + (t01 - t00) * cfx
        bot = t10 + (t11 - t10) * cfx
        chans.append(top + (bot - top) * cfy)
    return _place(chans, sloti)


def variant_b(uu, vv, cov):
    c = 3
    ci, cfx, cfy, sloti = _common(uu, vv, cov)
    quad = _quad_table(tex)[ci.reshape(-1)].astype(jnp.float32)  # [capK, 12]
    qt = quad.T.reshape(4 * c, CAP, K)  # ONE relayout; planes are native
    chans = []
    for i in range(c):
        t00 = qt[i]
        t01 = qt[c + i]
        t10 = qt[2 * c + i]
        t11 = qt[3 * c + i]
        top = t00 + (t01 - t00) * cfx
        bot = t10 + (t11 - t10) * cfx
        chans.append(top + (bot - top) * cfy)
    return _place(chans, sloti)


def variant_c(uu, vv, cov):
    c = 3
    ci, cfx, cfy, sloti = _common(uu, vv, cov)
    quad = _quad_table(tex)[ci].astype(jnp.float32)  # [cap, K, 12]
    q = quad.reshape(CAP, K, 4, c)
    gx = jnp.stack([1.0 - cfx, cfx, 1.0 - cfx, cfx], axis=2)  # [cap, K, 4]
    gy = jnp.stack([1.0 - cfy, 1.0 - cfy, cfy, cfy], axis=2)
    out = jnp.sum(q * (gx * gy)[..., None], axis=2)  # [cap, K, c]
    return _place([out[..., i] for i in range(c)], sloti)


def scanbench(fn, *args):
    @jax.jit
    def run(a):
        def body(ccum, x):
            outs = fn(a[0] + x * 0, a[1] + x * 0, a[2])
            return ccum + sum(jnp.sum(o) for o in outs), 0.0

        return jax.lax.scan(body, 0.0, jnp.arange(N, dtype=jnp.float32))[0]

    r = run(args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / N * 1e3


ra = variant_a(u, v, covered)
for name, fn in (("B transpose", variant_b), ("C grouped", variant_c)):
    rx = fn(u, v, covered)
    m = np.asarray(covered)
    for pa, px in zip(ra, rx):
        err = np.abs(np.asarray(pa) - np.asarray(px))[m].max()
        assert err < 1e-5, (name, err)
print("variants agree on covered pixels", flush=True)

for name, fn in (("A current  ", variant_a), ("B transpose", variant_b),
                 ("C grouped  ", variant_c)):
    t = scanbench(fn, u, v, covered)
    print(f"{name}: {t:7.3f} ms/frame", flush=True)


def probe_gather_only(uu, vv, cov):
    ci, cfx, cfy, sloti = _common(uu, vv, cov)
    quad = _quad_table(tex)[ci].astype(jnp.float32)
    return [jnp.sum(quad, axis=2), cfx, cfy]  # consume, no lerp/placement


def probe_no_place(uu, vv, cov):
    c = 3
    ci, cfx, cfy, sloti = _common(uu, vv, cov)
    quad = _quad_table(tex)[ci].astype(jnp.float32)
    q = quad.reshape(CAP, K, 4, c)
    gx = jnp.stack([1.0 - cfx, cfx, 1.0 - cfx, cfx], axis=2)
    gy = jnp.stack([1.0 - cfy, 1.0 - cfy, cfy, cfy], axis=2)
    out = jnp.sum(q * (gx * gy)[..., None], axis=2)
    return [out[..., i] for i in range(c)]


def probe_maps_only(uu, vv, cov):
    ci, cfx, cfy, sloti = _common(uu, vv, cov)
    return [ci.astype(jnp.float32), cfx, cfy]


for name, fn in (("maps only  ", probe_maps_only),
                 ("gather only", probe_gather_only),
                 ("no placemnt", probe_no_place)):
    t = scanbench(fn, u, v, covered)
    print(f"{name}: {t:7.3f} ms/frame", flush=True)
