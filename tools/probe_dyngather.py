#!/usr/bin/env python
"""Probe Mosaic's per-lane gather (tpu.dynamic_gather) on real hardware.

jax 0.9.0's Pallas TPU lowers ``jnp.take_along_axis(x, idx, axis)`` on a
2D block to ``tpu.dynamic_gather`` (lowering.py:_gather_lowering_rule):
  axis=0: out[i, j] = x[idx[i, j], j]   (per-lane pick across sublanes)
  axis=1: out[i, j] = x[i, idx[i, j]]   (per-sublane pick across lanes)
Shape support and cost are undocumented — this probe measures both, then
times a composed "windowed" texture lookup at the production count
(726k pixels, [5670, 128] compacted layout, [65536, 12] quad table):

  per 128-px segment: dynamic-slice an [8, 256]-row window of the
  VMEM-resident table at the segment's min texel row, lane-gather tx
  (two 128-wide halves + select), sublane-gather ty. If this beats the
  ~4 ms XLA row gather (tools/measure_gather_floor.py), the sampler
  moves into a Pallas kernel (docs/PERF.md backlog #2).

Usage: python tools/probe_dyngather.py   (axon TPU)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

N_SCAN = 16


def timed(name, fn, *args):
    @jax.jit
    def run(i0, *a):
        def body(carry, i):
            return carry + fn(i0 + i, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N_SCAN, dtype=jnp.int32))
        return acc

    try:
        r = bench_frame(run, lambda i: (jnp.int32(i * N_SCAN),) + args,
                        name=name, frames_per_call=N_SCAN, warmup=2, iters=8)
        print(f"{name:>52}: {r.p50_ms:8.3f} ms", flush=True)
        return r.p50_ms
    except Exception as e:  # noqa: BLE001 - probe reports and continues
        msg = str(e).split("\n")[0][:110]
        print(f"{name:>52}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None


# ---------------------------------------------------------------- shapes
def shape_probe():
    """Does take_along_axis compile in a kernel at various block shapes?"""
    for (s, l, axis) in [(8, 128, 0), (8, 128, 1), (16, 128, 0),
                         (32, 128, 0), (64, 128, 0), (256, 128, 0),
                         (8, 256, 1), (8, 512, 1), (16, 256, 1)]:
        def kern(x_ref, i_ref, o_ref, axis=axis):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis)

        x = jnp.asarray(rng.random((s, l)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, (s if axis == 0 else l),
                                       size=(s, l)), jnp.int32)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((s, l), jnp.float32),
            )(x, idx)
            ok = np.take_along_axis(np.asarray(x), np.asarray(idx), axis)
            match = np.array_equal(np.asarray(out), ok)
            print(f"  take_along_axis axis={axis} [{s:>3},{l:>3}]: "
                  f"compiles, {'exact' if match else 'WRONG VALUES'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:90]
            print(f"  take_along_axis axis={axis} [{s:>3},{l:>3}]: "
                  f"FAILED {msg}", flush=True)


# ------------------------------------------------- composed window lookup
SEGS = 5670          # production tier-0.35 compacted segment count
SEG_PER_STEP = 8     # segments per grid step
WIN = 8              # window rows


def window_kernel(y0_ref, ty_ref, tx_ref, tab_ref, o_ref):
    """Per segment: slice [WIN, 256] window at y0, lane-gather tx (two
    halves + select), sublane-gather ty-y0. One table plane (C=1)."""
    for s in range(SEG_PER_STEP):
        y0 = y0_ref[0, s]
        win = tab_ref[pl.ds(y0, WIN), :]                  # [WIN, 256]
        txs = tx_ref[s][None, :]                          # [1, 128]
        txb = jnp.broadcast_to(txs & 127, (WIN, 128))
        cl = jnp.take_along_axis(win[:, :128], txb, 1)    # [WIN, 128]
        cr = jnp.take_along_axis(win[:, 128:], txb, 1)
        c = jnp.where(jnp.broadcast_to(txs >= 128, (WIN, 128)), cr, cl)
        dyb = jnp.broadcast_to(ty_ref[s][None, :] - y0, (WIN, 128))
        v = jnp.take_along_axis(c, dyb, 0)                # [WIN, 128]
        o_ref[s, :] = v[0, :]


def composed_probe():
    tab = jnp.asarray(rng.random((256, 256)), jnp.float32)
    ty = jnp.asarray(rng.integers(0, 256, size=(SEGS, 128)), jnp.int32)
    # per-segment ty confined to an 8-row window (the production premise)
    y0 = jnp.asarray(rng.integers(0, 256 - WIN, size=(SEGS,)), jnp.int32)
    ty = y0[:, None] + (ty & (WIN - 1))
    tx = jnp.asarray(rng.integers(0, 256, size=(SEGS, 128)), jnp.int32)

    grid = SEGS // SEG_PER_STEP

    @functools.partial(jax.jit, static_argnames=())
    def run_win(y0a, tya, txa):
        return pl.pallas_call(
            window_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, SEG_PER_STEP), lambda g: (0, g),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((SEG_PER_STEP, 128), lambda g: (g, 0)),
                pl.BlockSpec((SEG_PER_STEP, 128), lambda g: (g, 0)),
                pl.BlockSpec((256, 256), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((SEG_PER_STEP, 128), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((SEGS, 128), jnp.float32),
        )(y0a.reshape(1, -1), tya, txa, tab)

    # correctness first
    try:
        out = run_win(y0, ty, tx)
        ok = np.asarray(tab)[np.asarray(ty), np.asarray(tx)]
        match = np.array_equal(np.asarray(out), ok)
        print(f"  windowed lookup [{SEGS}x128], C=1: "
              f"{'exact' if match else 'WRONG VALUES'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print("  windowed lookup FAILED:",
              str(e).split("\n")[0][:140], flush=True)
        return

    timed("windowed dyngather, C=1, 726k px",
          lambda i, a, b, c: jnp.sum(run_win(a, b, (c + i) & 255)),
          y0, ty, tx)

    # XLA row-gather baseline at the same count, 12-wide rows
    quad = jnp.asarray(rng.random((65536, 12)), jnp.float32)
    flat = (ty * 256 + tx).astype(jnp.int32)
    timed("XLA row gather [65536,12], 726k rows",
          lambda i, f: jnp.sum(quad[(f + i) & 65535]), flat)


if __name__ == "__main__":
    print("shape probe:", flush=True)
    shape_probe()
    print("composed probe:", flush=True)
    composed_probe()
