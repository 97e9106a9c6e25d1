#!/usr/bin/env python
"""Supertile quad-table geometry: can a 4096-row table cross the
gather's table-size threshold AND pay for its select chain?

Context (PERF.md round 4): the [65536, 12] quad gather at the tier-0.35
count (726k rows) costs ~5-6.4 ms with a ~4 ms count-independent floor;
tools/measure_gather_floor.py (f) showed a 4096-row table gathers 39%
faster at equal row count, but the 2x/4x packs (32768/16384 rows) did
not cross the threshold. A 4x4 supertile table ([th/4 * tw/4, 5*5*C])
IS 4096 rows at 256^2: each row holds the supertile's 5x5 texel patch
(wrap-padded borders), one gathered row serves any bilinear footprint
inside the supertile, and the 2x2 corner set is picked by a 15-select
binary tree on (ya&3, xa&3). Exact f32 texels -> bit-equal output.

Also measures 8x8 ([1024, 9*9*C]) for the curve's next point.

Usage: python tools/measure_supertile.py   (axon TPU)
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

rng = np.random.default_rng(0)
N_SCAN = 16
CAP = 5664           # tier-0.35 segments -> 726k pixels
TH = TW = 256
C = 3


def timed(name, fn, *args):
    @jax.jit
    def run(i0, *a):
        def body(carry, i):
            return carry + fn(i0 + i, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N_SCAN, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * N_SCAN),) + args,
                    name=name, frames_per_call=N_SCAN, warmup=2, iters=8)
    print(f"{name:>52}: {r.p50_ms:8.3f} ms", flush=True)
    return r.p50_ms


def supertile_table(data, s: int):
    """[th/s * tw/s, (s+1)^2 * C] patch table, repeat-wrapped borders."""
    th, tw, c = data.shape
    dy, dx = np.meshgrid(np.arange(s + 1), np.arange(s + 1), indexing="ij")
    sy, sx = np.meshgrid(np.arange(th // s), np.arange(tw // s),
                         indexing="ij")
    rows = (sy[:, :, None, None] * s + dy) % th
    cols = (sx[:, :, None, None] * s + dx) % tw
    patch = np.asarray(data)[rows, cols]          # [th/s, tw/s, s+1, s+1, C]
    return jnp.asarray(patch.reshape(th // s * (tw // s), -1), jnp.float32)


def sel_tree(cands, bits):
    """Binary-select cands[i] at per-pixel index given its bit planes."""
    level = cands
    for b in bits:
        level = [jnp.where(b, level[2 * i + 1], level[2 * i])
                 for i in range(len(level) // 2)]
    return level[0]


def main():
    data = jnp.asarray(rng.random((TH, TW, C)), jnp.float32)
    u = jnp.asarray(rng.random((CAP, 128)), jnp.float32)
    v = jnp.asarray(rng.random((CAP, 128)), jnp.float32)

    x = u * TW - 0.5
    y = v * TH - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xa = jnp.mod(x0.astype(jnp.int32), TW)
    ya = jnp.mod(y0.astype(jnp.int32), TH)

    # ---- baseline: shipped split-2 quad gather + lerp -------------------
    from software_renderer_tpu.ops.texture import Texture, _quad_table
    quad = _quad_table(Texture(data=data))
    ci = ya * TW + xa

    def quad_line(i, ci, fx, fy):
        cj = (ci + i) & (TH * TW - 1)
        half = CAP // 2
        q = jnp.concatenate([quad[cj[:half]], quad[cj[half:]]], axis=0)
        out = 0.0
        for cc in range(C):
            t00, t01 = q[..., cc], q[..., C + cc]
            t10, t11 = q[..., 2 * C + cc], q[..., 3 * C + cc]
            top = t00 + (t01 - t00) * fx
            bot = t10 + (t11 - t10) * fx
            out = out + jnp.sum(top + (bot - top) * fy)
        return out

    base = timed("quad [65536,12] split-2 gather+lerp", quad_line, ci,
                 fx, fy)

    # ---- supertile variants ---------------------------------------------
    for s in (4, 8):
        st = supertile_table(data, s)
        w = s + 1
        sid = (ya // s) * (TW // s) + (xa // s)
        py = ya % s
        px = xa % s

        def st_line(i, sid, py, px, fx, fy, st=st, s=s, w=w):
            nrows = st.shape[0]
            sj = (sid + i) % nrows
            half = CAP // 2
            g = jnp.concatenate([st[sj[:half]], st[sj[half:]]], axis=0)
            yb = [(py >> b) & 1 == 1 for b in range(int(np.log2(s)))]
            xb = [(px >> b) & 1 == 1 for b in range(int(np.log2(s)))]
            out = 0.0
            for cc in range(C):
                def tex(dy, dx):
                    return g[..., (dy * w + dx) * C + cc]
                # separable: per candidate py row, select the x pair.
                a = [sel_tree([tex(dy, dx) for dx in range(s)], xb)
                     for dy in range(s + 1)]
                b = [sel_tree([tex(dy, dx + 1) for dx in range(s)], xb)
                     for dy in range(s + 1)]
                t00 = sel_tree(a[:s], yb)
                t01 = sel_tree(b[:s], yb)
                t10 = sel_tree(a[1:], yb)
                t11 = sel_tree(b[1:], yb)
                top = t00 + (t01 - t00) * fx
                bot = t10 + (t11 - t10) * fx
                out = out + jnp.sum(top + (bot - top) * fy)
            return out

        # exactness vs the quad path: per-pixel channel-0 plane at i=0
        def st_plane(sid, py, px, fx, fy, st=st, s=s, w=w):
            g = st[sid]
            yb = [(py >> b) & 1 == 1 for b in range(int(np.log2(s)))]
            xb = [(px >> b) & 1 == 1 for b in range(int(np.log2(s)))]

            def tex(dy, dx):
                return g[..., (dy * w + dx) * C]
            a = [sel_tree([tex(dy, dx) for dx in range(s)], xb)
                 for dy in range(s + 1)]
            b = [sel_tree([tex(dy, dx + 1) for dx in range(s)], xb)
                 for dy in range(s + 1)]
            t00, t01 = sel_tree(a[:s], yb), sel_tree(b[:s], yb)
            t10, t11 = sel_tree(a[1:], yb), sel_tree(b[1:], yb)
            top = t00 + (t01 - t00) * fx
            bot = t10 + (t11 - t10) * fx
            return top + (bot - top) * fy

        def quad_plane(ci, fx, fy):
            q = quad[ci]
            t00, t01 = q[..., 0], q[..., C]
            t10, t11 = q[..., 2 * C], q[..., 3 * C]
            top = t00 + (t01 - t00) * fx
            bot = t10 + (t11 - t10) * fx
            return top + (bot - top) * fy

        got = np.asarray(jax.jit(st_plane)(sid, py, px, fx, fy))
        want = np.asarray(jax.jit(quad_plane)(ci, fx, fy))
        print(f"  s={s}: chan0 max |diff| vs quad path: "
              f"{np.abs(got - want).max():.3e}", flush=True)

        timed(f"supertile {s}x{s} [{st.shape[0]},{st.shape[1]}] "
              "gather+select+lerp", st_line, sid, py, px, fx, fy)

        def st_gather_only(i, sid, st=st):
            nrows = st.shape[0]
            sj = (sid + i) % nrows
            half = CAP // 2
            return (jnp.sum(st[sj[:half]]) + jnp.sum(st[sj[half:]]))

        timed(f"supertile {s}x{s} gather only", st_gather_only, sid)


if __name__ == "__main__":
    main()
