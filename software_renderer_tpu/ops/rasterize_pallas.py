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

# Tile geometry: (sublane x lane)-aligned f32 tiles. 32x128 = 16 KB/buffer.
TILE_H = 32
TILE_W = 128
# Triangles per setup-record block.
CHUNK = 32
# Record layout (REC_WIDTH f32 lanes per triangle):
# 0:3  a0 a1 a2   (x coefficients of the 3 sign-folded edges)
# 3:6  b0 b1 b2   (y coefficients)
# 6:9  c0 c1 c2   (constants)
# 9:12 za zb zc   (depth plane)
# 12:16 x0 y0 x1 y1 (bbox, inclusive, as float)
REC_WIDTH = 16


def pack_records(setup: TriangleSetup, chunk: int = CHUNK) -> jax.Array:
    """Pack TriangleSetup into [T_pad, REC_WIDTH] f32 raster records,
    padded to a chunk multiple with never-covering entries."""
    t = setup.num_triangles
    rec = jnp.concatenate(
        [
            setup.coef[:, 0, :],          # a0 a1 a2
            setup.coef[:, 1, :],          # b0 b1 b2
            setup.coef[:, 2, :],          # c0 c1 c2
            setup.zplane,                 # za zb zc
            setup.bbox.astype(jnp.float32),
        ],
        axis=-1,
    )
    pad = (-t) % chunk
    if pad or t == 0:
        filler = jnp.zeros((max(pad, chunk if t == 0 else pad), REC_WIDTH),
                           jnp.float32)
        # Poison: c = -1 (outside everywhere), depth = +inf, empty bbox.
        filler = filler.at[:, 6:9].set(-1.0)
        filler = filler.at[:, 11].set(jnp.inf)
        filler = filler.at[:, 12:14].set(1.0)  # x0=y0=1 > x1=y1=0
        rec = jnp.concatenate([rec, filler], axis=0)
    return rec


def _visibility_kernel(rec_ref, z_ref, id_ref, *, tile_h, tile_w, chunk):
    """rec_ref lives in SMEM: per-triangle scalars are read with dynamic
    indices (native scalar loads), then broadcast into tile-wide VPU ops."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _init():
        z_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
        id_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)  # NO_TRIANGLE

    # Pixel-center coordinates of this tile (Shaders.metal:133 semantics).
    x0f = (tx * tile_w).astype(jnp.float32)
    y0f = (ty * tile_h).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          .astype(jnp.float32) + (x0f + 0.5))
    ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          .astype(jnp.float32) + (y0f + 0.5))

    def body(k, carry):
        zbuf, idbuf = carry
        # bbox-vs-tile rejection (the ROI idea of Shaders.metal:89-114,
        # evaluated on-device per tile instead of via host readback).
        overlap = jnp.logical_and(
            jnp.logical_and(rec_ref[k, 14] >= x0f,
                            rec_ref[k, 12] < x0f + tile_w),
            jnp.logical_and(rec_ref[k, 15] >= y0f,
                            rec_ref[k, 13] < y0f + tile_h),
        )

        def rasterize(zbuf, idbuf):
            e0 = rec_ref[k, 0] * xs + rec_ref[k, 3] * ys + rec_ref[k, 6]
            e1 = rec_ref[k, 1] * xs + rec_ref[k, 4] * ys + rec_ref[k, 7]
            e2 = rec_ref[k, 2] * xs + rec_ref[k, 5] * ys + rec_ref[k, 8]
            inside = jnp.logical_and(
                jnp.logical_and(e0 >= 0.0, e1 >= 0.0), e2 >= 0.0)
            depth = (rec_ref[k, 9] * xs + rec_ref[k, 10] * ys
                     + rec_ref[k, 11])
            cand = jnp.where(inside, depth, jnp.inf)
            better = cand < zbuf  # strict: first triangle wins ties
            tri = c * chunk + k
            return (jnp.where(better, cand, zbuf),
                    jnp.where(better, tri, idbuf))

        return jax.lax.cond(overlap, rasterize,
                            lambda z, i: (z, i), zbuf, idbuf)

    zbuf, idbuf = jax.lax.fori_loop(
        0, chunk, body, (z_ref[:], id_ref[:]))
    z_ref[:] = zbuf
    id_ref[:] = idbuf


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "tile_h", "tile_w",
                                    "chunk", "interpret"))
def visibility_pallas(setup: TriangleSetup, *, width: int, height: int,
                      tile_h: int = TILE_H, tile_w: int = TILE_W,
                      chunk: int = CHUNK, interpret: bool | None = None):
    """Tile-rasterized visibility buffer.

    Returns (depth [H, W] f32, tri_id [H, W] i32) — same contract as
    ops/rasterize_ref.visibility_ref (golden-tested equal).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rec = pack_records(setup, chunk)
    t_pad = rec.shape[0]
    n_chunks = t_pad // chunk
    pad_h = (-height) % tile_h
    pad_w = (-width) % tile_w
    gh = (height + pad_h) // tile_h
    gw = (width + pad_w) // tile_w

    kernel = functools.partial(_visibility_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=chunk)
    depth, tri_id = pl.pallas_call(
        kernel,
        grid=(gh, gw, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk, REC_WIDTH), lambda ty, tx, c: (c, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c: (ty, tx),
                         memory_space=pltpu.VMEM),
        ),
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
    )(rec)
    if pad_h or pad_w:
        depth = depth[:height, :width]
        tri_id = tri_id[:height, :width]
    return depth, tri_id
