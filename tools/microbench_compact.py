#!/usr/bin/env python
"""Microbench: compaction-before-sort for the bin-build stage.

The current build_bins sorts the FULL [T*kmax + fill] packed-key emission
(1.23M keys at 1080p/100k, ~93% sentinels) to produce a [cap ~ 0.75T]
stream. Candidate: compact the emission to [cap] BEFORE the sort via
  starts = exclusive-cumsum(nspan)   (two triangular matmuls, exact f32)
  src    = searchsorted(starts, arange(cap), 'right') - 1
  k      = slot - starts[src]; tile = f(row-gathered per-tri data, k)
then sort only [cap + fill] keys.

Measures (fresh inputs per call, no constant folding):
  A. full-emission sort (current)       — the 3.5 ms line
  B. searchsorted alone at cap queries  — the unknown
  C. full compact path + small sort     — the candidate

Usage: nohup python tools/microbench_compact.py > /tmp/mb_compact.log 2>&1 &
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

T = int(os.environ.get("MB_T", "100000"))
KMAX = int(os.environ.get("MB_KMAX", "12"))
CHUNK = 128
NTILES = 255  # 1080p at 64x128
N_FILL = NTILES * CHUNK
CAP = -(int(-0.75 * T) // CHUNK) * CHUNK  # budget_pairs
ID_BITS = (T + 1).bit_length()
ITERS = int(os.environ.get("MB_ITERS", "10"))
FRAMES = 16

rng = np.random.default_rng(0)


def make_inputs(i):
    """Per-triangle spans mimicking the config4 distribution: ~55% culled,
    live spans mostly 1-2 with a tail."""
    r = np.random.default_rng(i)
    valid = r.random(T) < 0.45
    nspan = np.minimum(r.geometric(0.62, size=T), KMAX) * valid
    tx0 = r.integers(0, 14, size=T).astype(np.int32)
    ty0 = r.integers(0, 16, size=T).astype(np.int32)
    span_w = np.minimum(r.geometric(0.7, size=T), 4).astype(np.int32)
    return (jnp.asarray(nspan.astype(np.int32)), jnp.asarray(tx0),
            jnp.asarray(ty0), jnp.asarray(span_w))


def scan16(step):
    @jax.jit
    def run(nspan, tx0, ty0, span_w):
        def body(c, f):
            # fresh-ish input per frame: rotate the arrays
            s = jnp.roll(nspan, f), jnp.roll(tx0, f), jnp.roll(ty0, f), \
                jnp.roll(span_w, f)
            return c + step(*s), 0
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(FRAMES))
        return c
    return run


def step_full_sort(nspan, tx0, ty0, span_w):
    k = jnp.arange(KMAX, dtype=jnp.int32)
    dx = k[None, :] % span_w[:, None]
    dy = k[None, :] // span_w[:, None]
    tile = (ty0[:, None] + dy) * 15 + (tx0[:, None] + dx)
    pv = k[None, :] < nspan[:, None]
    keys = jnp.where(pv, tile, NTILES)
    packed = ((keys << ID_BITS)
              | jnp.arange(T, dtype=jnp.int32)[:, None]).reshape(-1)
    f = jnp.arange(N_FILL, dtype=jnp.int32)
    f_packed = ((f // CHUNK) << ID_BITS) | T
    s = jnp.sort(jnp.concatenate([packed, f_packed]))[:CAP + N_FILL]
    return jnp.sum(s.astype(jnp.float32))


def tri_cumsum_exclusive(x):
    """Exclusive cumsum of [T] int32 via two triangular matmuls (exact in
    f32 for sums < 2^24)."""
    blk = 256
    t_pad = -(-T // blk) * blk
    xp = jnp.zeros((t_pad,), jnp.float32).at[:T].set(x.astype(jnp.float32))
    xb = xp.reshape(-1, blk)  # [B, blk]
    nb = xb.shape[0]
    low_in = (jnp.arange(blk)[:, None] < jnp.arange(blk)[None, :]
              ).astype(jnp.float32)  # strictly-lower => exclusive
    within = jax.lax.dot(xb, low_in, precision=jax.lax.Precision.HIGHEST)
    bsum = jnp.sum(xb, axis=-1)  # [B]
    low_b = (jnp.arange(nb)[:, None] > jnp.arange(nb)[None, :]
             ).astype(jnp.float32)
    boff = jax.lax.dot(low_b, bsum, precision=jax.lax.Precision.HIGHEST)
    return (within + boff[:, None]).reshape(-1)[:T].astype(jnp.int32)


def step_searchsorted_only(nspan, tx0, ty0, span_w):
    starts = tri_cumsum_exclusive(nspan)
    slots = jnp.arange(CAP, dtype=jnp.int32)
    src = jnp.searchsorted(starts, slots, side="right").astype(jnp.int32) - 1
    return jnp.sum(src.astype(jnp.float32))


def step_compact_sort(nspan, tx0, ty0, span_w):
    starts = tri_cumsum_exclusive(nspan)
    table = jnp.stack([starts, tx0, ty0, span_w,
                       nspan, nspan, nspan, nspan], axis=-1)  # [T, 8] rows
    slots = jnp.arange(CAP, dtype=jnp.int32)
    src = jnp.searchsorted(starts, slots, side="right").astype(jnp.int32) - 1
    rows = table[jnp.clip(src, 0, T - 1)]  # one row gather [CAP, 8]
    k = slots - rows[:, 0]
    live = (src >= 0) & (k < rows[:, 4])
    dx = k % rows[:, 3]
    dy = k // rows[:, 3]
    tile = (rows[:, 2] + dy) * 15 + (rows[:, 1] + dx)
    keys = jnp.where(live, tile, NTILES)
    packed = (keys << ID_BITS) | jnp.clip(src, 0, T - 1)
    f = jnp.arange(N_FILL, dtype=jnp.int32)
    f_packed = ((f // CHUNK) << ID_BITS) | T
    s = jnp.sort(jnp.concatenate([packed, f_packed]))
    return jnp.sum(s.astype(jnp.float32))


for name, step in [("A full-emission sort", step_full_sort),
                   ("B cumsum+searchsorted", step_searchsorted_only),
                   ("C compact+small-sort", step_compact_sort)]:
    r = bench_frame(scan16(step), make_inputs, name=name,
                    frames_per_call=FRAMES, iters=ITERS)
    print(r, flush=True)
