#!/usr/bin/env python
"""Row-sharded binned perf on ONE chip (VERDICT r3 #1's done-criterion).

Row sharding (parallel/sharding.py) gives each device rows
[y0, y0+rows) of the frame via render_rows; per-frame wall time on an
N-device mesh is the SLOWEST shard. Real multi-chip hardware is not
available, so measure the per-shard cost on the one real chip: a
half-frame shard should cost <= 0.575x the full frame (ideal 0.5 +15%),
else row sharding does not scale even in principle (per-shard fixed
costs — the [T]-column front-end runs per shard — would dominate).

Usage: python tools/measure_rowshard.py   (axon TPU; ~5 min with cache)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.render import render_rows

FRAMES_PER_CALL = int(os.environ.get("BENCH_FRAMES_PER_CALL", "64"))


def timed(name, render_fn, rp):
    base = rp.transform

    def transform_of(i):
        t = i.astype(jnp.float32) * (1.0 / 60.0)
        q = tf.quat_from_axis_angle(
            tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
        return base @ tf.rotation_matrix(q)

    @jax.jit
    def run(i0):
        def body(carry, i):
            fb = render_fn(dataclasses.replace(
                rp, transform=transform_of(i0 + i)))
            return carry + jnp.sum(fb.color), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(FRAMES_PER_CALL, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * FRAMES_PER_CALL),),
                    name=name, frames_per_call=FRAMES_PER_CALL,
                    warmup=2, iters=12)
    print(f"{name:>28}: p50 {r.p50_ms:8.3f} ms", flush=True)
    return r.p50_ms


def main():
    tris = int(os.environ.get("BENCH_TRIS", "100000"))
    rp = scenes.config4_many_objects(0.0, triangles=tris)
    h = rp.height

    full = timed("full frame (auto)",
                 lambda r: sr.render(r, backend="auto"), rp)
    shard_ms = {}
    for n_shards in (2, 4):
        rows = h // n_shards
        per = [timed(f"rows shard {i}/{n_shards} (auto)",
                     lambda r, y0=i * rows: render_rows(
                         r, y_start=y0, rows=rows, backend="auto"), rp)
               for i in range(n_shards)]
        shard_ms[n_shards] = max(per)

    print()
    ok = True
    for n_shards, worst in shard_ms.items():
        ratio = worst / full
        bound = 1.0 / n_shards * 1.15
        verdict = "OK" if ratio <= bound else "FAIL"
        if ratio > bound:
            ok = False
        print(f"{n_shards}-way rows: worst shard {worst:.3f} ms = "
              f"{ratio:.3f}x full (bound {bound:.3f}) {verdict}",
              flush=True)
    print("ROWSHARD " + ("PASSED" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
