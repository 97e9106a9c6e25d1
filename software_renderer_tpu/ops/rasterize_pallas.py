"""Pallas TPU tile rasterizer: the production visibility pass.

TPU-native replacement for the reference's GPU pipeline
(renderer/GpuRenderer.swift + renderer/Shaders.metal). Where the reference
issues one host-driven compute dispatch per triangle over its ROI — with a
CPU readback of the ROI buffer between two blocking command buffers
(GpuRenderer.swift:87-138, the structural perf sin SURVEY.md §3.2 calls
out) — this kernel runs the whole frame as ONE fused device computation:

* The screen is tiled into VMEM-resident blocks (TILE_H x TILE_W). The
  z-buffer and triangle-id buffer for a tile stay in VMEM registers across
  the whole triangle stream — the reference instead does a read-modify-
  write against device memory per pixel per triangle
  (Shaders.metal:158-164).
* Triangles arrive as precomputed setup records (ops/setup.py): exact
  sign-folded edge coefficients + screen-space depth plane + bbox. The
  per-triangle inner body is ~15 VPU ops on the whole tile: three affine
  edge evaluations, an inside mask, a depth plane evaluation, and a
  strict less-than select — semantically identical to
  Shaders.metal:136-164 but vectorized over 4096 pixels at once.
* Triangles are processed in a fixed sequential order (grid's innermost
  axis + in-chunk loop), which reproduces the reference's encoder-order
  z-buffer determinism (GpuRenderer.swift:117-138) without atomics.
* A per-triangle bbox-vs-tile test predicates the body (``pl.when``), the
  vectorized analogue of the reference dispatching only over each
  triangle's ROI.

The output is a visibility buffer (depth + winning triangle id); shading
happens exactly once per pixel downstream (ops/resolve.py). Binned
dispatch (per-tile triangle lists, ops/binning.py) removes the O(tiles x
all-triangles) term for large scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .setup import TriangleSetup

# Tile geometry: (sublane x lane)-aligned f32 tiles. 64x128 = 32 KB/buffer.
# Swept on TPU v5e at 1080p/100k tris across the full benchmark animation:
# 64x128+chunk 64 wins (32 FPS vs 26 at 32x128) — smaller tiles double
# vertical bbox spans, inflating bin pairs and overflow at steep angles.
TILE_H = 64
TILE_W = 128
# Triangles per setup-record block. Grid-step overhead measured ~5 us on
# v5e (axon) — doubling the chunk from 64 halved the fused kernel's time
# (12.6 -> 5.7 ms at 1080p/100k) by halving grid steps; the extra per-tile
# padding (chunk/2 avg slots) is cheaper than the steps it removes.
CHUNK = 128
# Record layout (REC_WIDTH f32 lanes per triangle). Only edges e0/e1 are
# stored; e2 = |D| - e0 - e1 is reconstructed exactly in-kernel (all values
# are integer-scaled and < 2^23, so the subtraction is exact — see
# ops/setup.py numerics note).
# 0:2   a0 a1      (x coefficients of sign-folded edges 0, 1)
# 2:4   b0 b1      (y coefficients)
# 4:6   c0 c1      (constants)
# 6     Dabs       (|2*area| = e0 + e1 + e2)
# 7:10  za zb zc   (depth plane)
# 10:14 x0 y0 x1 y1 (bbox, inclusive, as float)
# 14    global triangle id as float (exact below 2^24; -1 = inert)
# 15    reserved
REC_WIDTH = 16


def _poison_row():
    """A record that covers nothing and loses every depth test."""
    row = jnp.zeros((REC_WIDTH,), jnp.float32)
    row = row.at[4:6].set(-1.0)     # c0 = c1 = -1 -> e0, e1 < 0 everywhere
    row = row.at[9].set(jnp.inf)    # zc = +inf
    row = row.at[10:12].set(1.0)    # empty bbox: x0=y0=1 > x1=y1=0
    row = row.at[14].set(-1.0)      # id = -1 (NO_TRIANGLE)
    return row


def pack_records(setup: TriangleSetup, chunk: int = CHUNK) -> jax.Array:
    """Pack TriangleSetup into [T_pad, REC_WIDTH] f32 raster records,
    padded to a chunk multiple with never-covering entries."""
    t = setup.num_triangles
    abs_d = jnp.abs(setup.area2) * setup.valid  # poisoned rows get 0
    rec = jnp.concatenate(
        [
            setup.coef[:, 0, 0:2],        # a0 a1
            setup.coef[:, 1, 0:2],        # b0 b1
            setup.coef[:, 2, 0:2],        # c0 c1
            abs_d[:, None],               # |D|
            setup.zplane,                 # za zb zc
            setup.bbox.astype(jnp.float32),
            jnp.arange(t, dtype=jnp.float32)[:, None],  # global id
            jnp.zeros((t, 1), jnp.float32),
        ],
        axis=-1,
    )
    # Re-poison invalid triangles (setup zeroes their coef; a fully-zero
    # record would read "inside" since e2 = 0 - 0 - 0 = 0 >= 0).
    rec = jnp.where(setup.valid[:, None], rec, _poison_row())
    pad = (-t) % chunk
    if pad or t == 0:
        n_fill = max(pad, chunk if t == 0 else pad)
        rec = jnp.concatenate(
            [rec, jnp.tile(_poison_row()[None], (n_fill, 1))], axis=0)
    return rec


def _visibility_kernel(yoff_ref, nlive_ref, rec_ref, *rest, tile_h, tile_w,
                       chunk, merge, lex_tie):
    """rec_ref lives in SMEM: per-triangle scalars are read with dynamic
    indices (native scalar loads), then broadcast into tile-wide VPU ops.
    yoff_ref (SMEM scalar) puts tiles at global frame rows, making
    row-sharded rendering bitwise identical to the full frame.

    merge=False: rest = (z_ref, id_ref); buffers are cleared at chunk 0.
    merge=True:  rest = (z_in_ref, id_in_ref, z_ref, id_ref); chunk 0 seeds
    from an existing visibility buffer (the overflow pass,
    ops/binning.py). lex_tie selects lexicographic (depth, id) tie-break —
    order-independent and equal to the reference's first-drawn-wins rule.
    """
    if merge:
        z_in_ref, id_in_ref, z_ref, id_ref = rest
    else:
        z_ref, id_ref = rest
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _init():
        if merge:
            z_ref[:] = z_in_ref[:]
            id_ref[:] = id_in_ref[:]
        else:
            z_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
            id_ref[:] = jnp.full((tile_h, tile_w), -1,
                                 jnp.int32)  # NO_TRIANGLE

    # Pixel-center coordinates of this tile (Shaders.metal:133 semantics).
    x0f = (tx * tile_w).astype(jnp.float32)
    y0f = (ty * tile_h + yoff_ref[0, 0]).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          .astype(jnp.float32) + (x0f + 0.5))
    ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          .astype(jnp.float32) + (y0f + 0.5))

    def body(k, carry):
        zbuf, idbuf = carry
        # bbox-vs-tile rejection (the ROI idea of Shaders.metal:89-114,
        # evaluated on-device per tile instead of via host readback).
        overlap = jnp.logical_and(
            jnp.logical_and(rec_ref[k, 12] >= x0f,
                            rec_ref[k, 10] < x0f + tile_w),
            jnp.logical_and(rec_ref[k, 13] >= y0f,
                            rec_ref[k, 11] < y0f + tile_h),
        )

        def rasterize(zbuf, idbuf):
            e0 = rec_ref[k, 0] * xs + rec_ref[k, 2] * ys + rec_ref[k, 4]
            e1 = rec_ref[k, 1] * xs + rec_ref[k, 3] * ys + rec_ref[k, 5]
            e2 = rec_ref[k, 6] - e0 - e1  # exact (integer-scaled values)
            inside = jnp.logical_and(
                jnp.logical_and(e0 >= 0.0, e1 >= 0.0), e2 >= 0.0)
            # Coverage contract: clamp to the triangle's integer bbox
            # (the oracle's / Metal's bbox-loop semantics). For
            # numerically SAFE triangles (ops/setup.py coverage_safe)
            # this is a provable no-op; for unsafe slivers — which the
            # binned path routes HERE via the overflow waves — it stops
            # rounding-shifted edges from covering pixels beyond the
            # bbox (found by tests/test_fuzz.py).
            inside = jnp.logical_and(
                inside,
                jnp.logical_and(
                    jnp.logical_and(xs >= rec_ref[k, 10],
                                    xs <= rec_ref[k, 12] + 1.0),
                    jnp.logical_and(ys >= rec_ref[k, 11],
                                    ys <= rec_ref[k, 13] + 1.0)))
            depth = (rec_ref[k, 7] * xs + rec_ref[k, 8] * ys
                     + rec_ref[k, 9])
            cand = jnp.where(inside, depth, jnp.inf)
            tri = rec_ref[k, 14].astype(jnp.int32)
            if lex_tie:
                better = jnp.logical_or(
                    cand < zbuf,
                    jnp.logical_and(cand == zbuf,
                                    jnp.logical_and(inside, tri < idbuf)))
            else:
                better = cand < zbuf  # strict: first triangle wins ties
            return (jnp.where(better, cand, zbuf),
                    jnp.where(better, tri, idbuf))

        return jax.lax.cond(overlap, rasterize,
                            lambda z, i: (z, i), zbuf, idbuf)

    @pl.when(c * chunk < nlive_ref[0, 0])
    def _work():
        zbuf, idbuf = jax.lax.fori_loop(
            0, chunk, body, (z_ref[:], id_ref[:]))
        z_ref[:] = zbuf
        id_ref[:] = idbuf


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def effective_chunk(chunk: int, interpret: bool) -> int:
    """Clamp the record-block size under the Pallas interpreter.

    The chunk is pure layout — outputs are bit-identical at any value —
    but interpret mode (CPU tests) traces the fully-unrolled kernel body,
    so compile time grows with it. Real-TPU runs keep the large chunk
    (grid-step overhead ~5 us/step on v5e makes fewer, fatter steps win).
    """
    return min(chunk, 64) if interpret else chunk


def _pad_hw(height, width, tile_h, tile_w):
    pad_h = (-height) % tile_h
    pad_w = (-width) % tile_w
    return pad_h, pad_w, (height + pad_h) // tile_h, (width + pad_w) // tile_w


def visibility_pallas_merge(rec, z_in, id_in, *, width: int,
                            height: int, y_start=0, n_live=None,
                            tile_h: int = TILE_H, tile_w: int = TILE_W,
                            chunk: int = CHUNK, lex_tie: bool = True,
                            interpret: bool | None = None):
    """Rasterize a record stream *into* an existing visibility buffer
    (the overflow pass of the binned pipeline, ops/binning.py).

    rec: [T_pad, REC_WIDTH] records (col 14 carries global ids; -1
    entries are inert); z_in/id_in: [H, W] buffers to merge into.
    n_live: optional traced count of live leading records — chunks past it
    are skipped entirely (the overflow list is usually nearly empty).
    """
    if interpret is None:
        interpret = default_interpret()
    t_pad = rec.shape[0]
    n_chunks = t_pad // chunk
    pad_h, pad_w, gh, gw = _pad_hw(height, width, tile_h, tile_w)
    if pad_h or pad_w:
        z_in = jnp.pad(z_in, ((0, pad_h), (0, pad_w)),
                       constant_values=jnp.inf)
        id_in = jnp.pad(id_in, ((0, pad_h), (0, pad_w)),
                        constant_values=-1)

    kernel = functools.partial(_visibility_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=chunk, merge=True,
                               lex_tie=lex_tie)
    tile_spec = pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c: (ty, tx),
                             memory_space=pltpu.VMEM)
    depth, tri_id = pl.pallas_call(
        kernel,
        grid=(gh, gw, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda ty, tx, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ty, tx, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, REC_WIDTH), lambda ty, tx, c: (c, 0),
                         memory_space=pltpu.SMEM),
            tile_spec, tile_spec,
        ],
        out_specs=(tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(y_start, jnp.int32).reshape(1, 1),
      jnp.asarray(t_pad if n_live is None else n_live,
                  jnp.int32).reshape(1, 1), rec, z_in, id_in)
    if pad_h or pad_w:
        depth = depth[:height, :width]
        tri_id = tri_id[:height, :width]
    return depth, tri_id


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "tile_h", "tile_w",
                                    "chunk", "interpret"))
def visibility_pallas(setup: TriangleSetup, *, width: int, height: int,
                      y_start=0,
                      tile_h: int = TILE_H, tile_w: int = TILE_W,
                      chunk: int = CHUNK, interpret: bool | None = None):
    """Tile-rasterized visibility buffer (unbinned: every tile walks every
    triangle chunk with bbox rejection — right for small/medium scenes;
    ops/binning.py removes the O(tiles x triangles) term for large ones).

    Returns (depth [H, W] f32, tri_id [H, W] i32) — same contract as
    ops/rasterize_ref.visibility_ref (golden-tested equal).
    """
    if interpret is None:
        interpret = default_interpret()
    chunk = effective_chunk(chunk, interpret)
    rec = pack_records(setup, chunk)
    t_pad = rec.shape[0]
    n_chunks = t_pad // chunk
    pad_h, pad_w, gh, gw = _pad_hw(height, width, tile_h, tile_w)

    kernel = functools.partial(_visibility_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=chunk, merge=False,
                               lex_tie=False)
    tile_spec = pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c: (ty, tx),
                             memory_space=pltpu.VMEM)
    depth, tri_id = pl.pallas_call(
        kernel,
        grid=(gh, gw, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda ty, tx, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ty, tx, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, REC_WIDTH), lambda ty, tx, c: (c, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(y_start, jnp.int32).reshape(1, 1),
      jnp.asarray(setup.num_triangles, jnp.int32).reshape(1, 1), rec)
    if pad_h or pad_w:
        depth = depth[:height, :width]
        tri_id = tri_id[:height, :width]
    return depth, tri_id
