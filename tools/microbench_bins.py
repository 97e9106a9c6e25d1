#!/usr/bin/env python
"""Cumulative-prefix profile of build_bins internals on the config4 scene.

The bins stage costs +3.0 ms/frame in tools/profile_stages.py but a
standalone 1.23M-key sort microbenches at ~1 ms — this locates the other
~2 ms. Mirrors build_bins' code exactly (same shapes/dtypes), stopping at
successive prefixes; each stage consumes everything computed so far.

Usage: nohup python tools/microbench_bins.py > /tmp/mb_bins.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.ops.setup import triangle_setup_from_corners
from software_renderer_tpu.ops.vertex import corner_stage

W, H = 1920, 1080
TRIS = 100000
FRAMES = 16
ITERS = int(os.environ.get("MB_ITERS", "8"))
TILE_H, TILE_W, CHUNK, KMAX = 64, 128, 128, 12
BUDGET = 0.75

rp = scenes.config4_many_objects(0.0, width=W, height=H, triangles=TRIS)
mesh = rp.mesh
corners0 = mesh.positions[mesh.triangles()]
T = int(corners0.shape[0])


def setup_of(i):
    t = i.astype(jnp.float32) * (1.0 / 60.0)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
    m = rp.transform @ tf.rotation_matrix(q)
    screen_c, _ = corner_stage(corners0, m, W, H)
    return triangle_setup_from_corners(screen_c, W, H,
                                       cull_backfaces=rp.cull_backfaces)


def bins_prefix(setup, upto: int):
    t = setup.num_triangles
    gh, gw = -(-H // TILE_H), -(-W // TILE_W)
    ntiles = gh * gw
    bbox = setup.bbox
    tx0 = bbox[:, 0] // TILE_W
    tx1 = bbox[:, 2] // TILE_W
    ty0 = jnp.clip(bbox[:, 1] // TILE_H, 0, gh - 1)
    ty1 = jnp.clip(bbox[:, 3] // TILE_H, 0, gh - 1)
    span_w = tx1 - tx0 + 1
    nspan = span_w * (ty1 - ty0 + 1)
    valid = setup.valid
    small = valid & (nspan <= KMAX)
    acc = (jnp.sum(nspan) + jnp.sum(small)).astype(jnp.float32)
    if upto == 0:
        return acc
    budget_pairs = -(int(-BUDGET * max(t, 1)) // CHUNK) * CHUNK
    nsp = jnp.where(small, nspan, 0)
    blk = 256
    t_pad = -(-t // blk) * blk
    nsp_p = jnp.zeros((t_pad,), nsp.dtype).at[:t].set(nsp)
    block_cum_end = jnp.cumsum(jnp.sum(nsp_p.reshape(-1, blk), axis=-1))
    binned = small & (jnp.repeat(block_cum_end, blk)[:t] <= budget_pairs)
    overflow = valid & ~binned
    acc = acc + jnp.sum(binned) + jnp.sum(overflow)
    if upto == 1:
        return acc
    k = jnp.arange(KMAX, dtype=jnp.int32)
    dx = k[None, :] % span_w[:, None]
    dy = k[None, :] // span_w[:, None]
    tile = (ty0[:, None] + dy) * gw + (tx0[:, None] + dx)
    pair_valid = binned[:, None] & (k[None, :] < nspan[:, None])
    keys = jnp.where(pair_valid, tile, ntiles)
    acc = acc + jnp.sum(keys).astype(jnp.float32)
    if upto == 2:
        return acc
    rows = jnp.arange(gh, dtype=jnp.int32)
    cols = jnp.arange(gw, dtype=jnp.int32)
    rowmask = ((rows[None, :] >= ty0[:, None])
               & (rows[None, :] <= ty1[:, None])
               & binned[:, None]).astype(jnp.float32)
    colmask = ((cols[None, :] >= tx0[:, None])
               & (cols[None, :] <= tx1[:, None])).astype(jnp.float32)
    counts = jnp.dot(rowmask.T, colmask,
                     precision=jax.lax.Precision.HIGHEST
                     ).astype(jnp.int32).reshape(ntiles)
    acc = acc + jnp.sum(counts).astype(jnp.float32)
    if upto == 3:
        return acc
    n_pairs = t * KMAX
    n_fill = ntiles * CHUNK
    n_all = n_pairs + n_fill
    pairs_cap = min(int(budget_pairs), -(-n_pairs // CHUNK) * CHUNK)
    cap = pairs_cap + n_fill
    id_bits = (t + 1).bit_length()
    tri_ids = jnp.arange(t, dtype=jnp.int32)
    packed = ((keys << id_bits) | tri_ids[:, None]).reshape(-1)
    pad_counts = jnp.maximum(-(-counts // CHUNK), 1) * CHUNK
    pad_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)[:-1]])
    f = jnp.arange(n_fill, dtype=jnp.int32)
    f_tile = f // CHUNK
    f_active = (f % CHUNK) < (pad_counts - counts)[f_tile]
    f_keys = jnp.where(f_active, f_tile, ntiles + 1)
    f_packed = (f_keys << id_bits) | t
    parts = [packed, f_packed]
    if n_all < cap:
        parts.append(jnp.full((cap - n_all,),
                              (((ntiles + 1) << id_bits) | t), jnp.int32))
    allk = jnp.concatenate(parts)
    acc = acc + (jnp.sum(allk) + jnp.sum(pad_starts)).astype(jnp.float32)
    if upto == 4:
        return acc
    sorted2 = jnp.sort(allk)[:cap]
    s_id = sorted2 & ((1 << id_bits) - 1)
    s_key = sorted2 >> id_bits
    ids = jnp.where((s_id < t) & (s_key < ntiles), s_id, -1
                    ).astype(jnp.int32)
    acc = acc + jnp.sum(ids).astype(jnp.float32)
    if upto == 5:
        return acc
    n_chunks = cap // CHUNK
    cc = jnp.arange(n_chunks, dtype=jnp.int32)
    chunk_starts = pad_starts // CHUNK
    chunk_tile = (jnp.searchsorted(chunk_starts, cc, side="right") - 1
                  ).astype(jnp.int32)
    ct_c = jnp.clip(chunk_tile, 0, ntiles - 1)
    first_flag = (cc == chunk_starts[ct_c]).astype(jnp.int32)
    live_flag = (ids[cc * CHUNK] >= 0).astype(jnp.int32)
    last_flag = jnp.concatenate(
        [(chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])
    acc = acc + (jnp.sum(chunk_tile) + jnp.sum(first_flag)
                 + jnp.sum(live_flag) + jnp.sum(last_flag)
                 ).astype(jnp.float32)
    return acc


NAMES = ["0 spans", "1 budget", "2 emission", "3 counts-mm",
         "4 pack+fill", "5 sort+decode", "6 flags"]
prev = 0.0
for upto in range(7):
    @jax.jit
    def run(i0, upto=upto):
        def body(c, f):
            s = setup_of(i0 + f)
            return c + bins_prefix(s, upto), 0
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(FRAMES, dtype=jnp.int32))
        return c

    r = bench_frame(run, lambda i: (jnp.int32(i * FRAMES),),
                    name=NAMES[upto], frames_per_call=FRAMES, iters=ITERS)
    print(f"{NAMES[upto]:>14}: {r.p50_ms:7.3f} ms/frame "
          f"(+{r.p50_ms - prev:7.3f})  compile {r.compile_s:.1f}s",
          flush=True)
    prev = r.p50_ms
