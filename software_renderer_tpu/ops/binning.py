"""Tile binning: per-tile triangle lists built on-device, and the binned
visibility kernel.

This is the TPU-native answer to the reference's ROI architecture. The
reference computes per-triangle ROIs on the GPU, then *reads them back to
the CPU* and issues one rasterize dispatch per triangle over its ROI
(GpuRenderer.swift:87-138 — the mid-frame host sync SURVEY.md §3.2 flags).
Here the inverse mapping (tile -> triangles) is built entirely on-device
with one stable sort, and the raster kernel walks each tile's own triangle
list — work is O(sum of bbox-tile overlaps), not O(tiles x triangles),
with zero host round-trips.

Pipeline (all inside one jit):
 1. expansion  — each triangle emits up to KMAX (tile, tri) pairs from its
    bbox tile span; triangles spanning more tiles go to the *overflow*
    list (processed by the bbox-tested unbinned kernel and merged with a
    lexicographic (depth, id) rule — identical to the reference's
    first-drawn-wins tie semantics, but order-independent).
 2. argsort    — pairs sorted by tile id (stable, so each tile's list stays
    in ascending triangle order = reference encoder order).
 3. layout     — each tile's segment is padded to a CHUNK multiple and laid
    out densely; every tile owns >= 1 chunk so every output tile is
    initialized. A scalar-prefetched chunk->tile map drives the kernel's
    output BlockSpec (the grouped/"megablox" pattern): consecutive chunks
    of one tile revisit the same VMEM block, so the z/id buffers stay
    on-chip across the whole list.
 4. kernel     — 1D grid over chunks; same exact edge/depth math as
    ops/rasterize_pallas.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_pallas import (
    CHUNK, REC_WIDTH, TILE_H, TILE_W, _poison_row, default_interpret,
    pack_records, visibility_pallas_merge,
)
from .rasterize_ref import pixel_centers
from .setup import TriangleSetup

KMAX = 4             # max tiles per triangle in the binned stream
OVERFLOW_CAP = 1024  # max huge triangles (spanning > KMAX tiles) per frame
# Binned-stream pair budget, in units of T (triangle count). Small
# triangles average ~1.3 bbox-tile overlaps, so 2T of slots is generous;
# triangles past the budget spill to the overflow list (still correct,
# just slower). Keeping the stream near its *used* size matters: the
# kernel's grid covers the whole static capacity, and poison tail chunks
# cost real grid steps.
PAIR_BUDGET_FACTOR = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedStream:
    """Chunk-aligned per-tile triangle stream + overflow list."""

    rec: jax.Array          # [cap, REC_WIDTH] f32 records in bin order
    ids: jax.Array          # [cap] i32 global triangle ids (-1 = inert)
    chunk_tile: jax.Array   # [cap//chunk] i32 tile id per chunk
    first_flag: jax.Array   # [cap//chunk] i32 1 = first chunk of its tile
    overflow_rec: jax.Array  # [OVERFLOW_CAP, REC_WIDTH]
    overflow_ids: jax.Array  # [OVERFLOW_CAP] i32
    n_overflow: jax.Array    # [] i32 (> OVERFLOW_CAP => dropped triangles,
    #                            surfaced as a diagnostic)


def build_bins(setup: TriangleSetup, rec, *, width: int, height: int,
               y_start=0, tile_h: int = TILE_H, tile_w: int = TILE_W,
               chunk: int = CHUNK, kmax: int = KMAX,
               overflow_cap: int = OVERFLOW_CAP) -> BinnedStream:
    """Build per-tile triangle lists from triangle bboxes. rec = packed
    records (pack_records(setup), unpadded prefix rows used)."""
    t = setup.num_triangles
    gh = -(-height // tile_h)
    gw = -(-width // tile_w)
    ntiles = gh * gw

    bbox = setup.bbox  # [T, 4] x0 y0 x1 y1, clamped to the full viewport
    y0g = jnp.asarray(y_start, jnp.int32)
    # Tile span in this slice's tile grid (global rows shifted by y_start).
    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 2] // tile_w
    ty0 = jnp.clip((bbox[:, 1] - y0g) // tile_h, 0, gh - 1)
    ty1 = jnp.clip((bbox[:, 3] - y0g) // tile_h, 0, gh - 1)
    in_slice = (bbox[:, 3] >= y0g) & (bbox[:, 1] < y0g + gh * tile_h)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    nspan = span_w * span_h
    valid = setup.valid & in_slice
    small = valid & (nspan <= kmax)
    # Pair budget: triangles whose cumulative pair demand exceeds the
    # budget spill to the overflow list (correctness preserved; the
    # overflow pass walks them per tile with bbox rejection).
    budget_pairs = -(-PAIR_BUDGET_FACTOR * max(t, 1) // chunk) * chunk
    cum_pairs = jnp.cumsum(jnp.where(small, nspan, 0))
    binned = small & (cum_pairs <= budget_pairs)
    overflow = valid & ~binned

    # 1. Expansion: pair k of triangle t covers tile (ty0 + k // span_w,
    #    tx0 + k % span_w).
    k = jnp.arange(kmax, dtype=jnp.int32)
    dx = k[None, :] % span_w[:, None]
    dy = k[None, :] // span_w[:, None]
    tile = (ty0[:, None] + dy) * gw + (tx0[:, None] + dx)  # [T, kmax]
    pair_valid = binned[:, None] & (k[None, :] < nspan[:, None])
    keys = jnp.where(pair_valid, tile, ntiles).reshape(-1)  # [T*kmax]

    # 2. Stable sort by tile; invalid pairs (key = ntiles) go to the end.
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    sorted_tri = (order // kmax).astype(jnp.int32)

    # 3. Dense chunk-aligned layout.
    tile_range = jnp.arange(ntiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_keys, tile_range, side="left")
    ends = jnp.searchsorted(sorted_keys, tile_range, side="right")
    counts = (ends - starts).astype(jnp.int32)
    pad_counts = jnp.maximum(-(-counts // chunk), 1) * chunk
    pad_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)[:-1]])

    cap = int(budget_pairs) + ntiles * chunk
    j = jnp.arange(t * kmax, dtype=jnp.int32)
    key_j = sorted_keys
    in_range = key_j < ntiles
    key_c = jnp.clip(key_j, 0, ntiles - 1)
    dst = jnp.where(in_range, pad_starts[key_c] + (j - starts[key_c]), cap)
    ids = jnp.full((cap,), -1, jnp.int32).at[dst].set(sorted_tri,
                                                      mode="drop")

    # Chunk -> tile map + first-chunk flags (scalar prefetch for the
    # kernel's output BlockSpec). Tail chunks (beyond the last used one)
    # resolve to the last tile with flag 0: no DMA switch, no compute.
    n_chunks = cap // chunk
    cc = jnp.arange(n_chunks, dtype=jnp.int32)
    chunk_starts = pad_starts // chunk
    chunk_tile = (jnp.searchsorted(chunk_starts, cc, side="right") - 1
                  ).astype(jnp.int32)
    first_flag = (cc == chunk_starts[jnp.clip(chunk_tile, 0, ntiles - 1)]
                  ).astype(jnp.int32)

    # Gather records into bin order ([cap, REC_WIDTH]); -1 -> poison.
    rec_binned = jnp.where(
        (ids >= 0)[:, None],
        rec[jnp.clip(ids, 0, rec.shape[0] - 1)],
        _poison_row()[None, :],
    )

    # Overflow list: huge triangles, ascending id (reference draw order).
    # Fixed chunk-aligned length regardless of T.
    ov_len = -(-min(overflow_cap, max(t, 1)) // chunk) * chunk
    ov_key = jnp.where(overflow, jnp.arange(t, dtype=jnp.int32), t)
    ov_sorted = jnp.full((ov_len,), t, jnp.int32).at[
        : min(t, ov_len)].set(jnp.sort(ov_key)[: min(t, ov_len)])
    ov_ids = jnp.where(ov_sorted < t, ov_sorted, -1)
    ov_rec = jnp.where(
        (ov_ids >= 0)[:, None],
        rec[jnp.clip(ov_ids, 0, rec.shape[0] - 1)],
        _poison_row()[None, :],
    )
    return BinnedStream(
        rec=rec_binned, ids=ids, chunk_tile=chunk_tile,
        first_flag=first_flag, overflow_rec=ov_rec, overflow_ids=ov_ids,
        n_overflow=jnp.sum(overflow.astype(jnp.int32)),
    )


def _binned_kernel(ct_ref, ff_ref, yoff_ref, rec_ref,
                   z_ref, id_ref, *, tile_h, tile_w, chunk, gw):
    """One grid step = one chunk of one tile's triangle list."""
    cc = pl.program_id(0)

    @pl.when(ff_ref[cc] == 1)
    def _init():
        z_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
        id_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    tile = ct_ref[cc]
    x0f = ((tile % gw) * tile_w).astype(jnp.float32)
    y0f = ((tile // gw) * tile_h + yoff_ref[0]).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          .astype(jnp.float32) + (x0f + 0.5))
    ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          .astype(jnp.float32) + (y0f + 0.5))

    def body(k, carry):
        zbuf, idbuf = carry
        # Branchless: poison records (ids -1, padding/tail) have e0 < 0
        # everywhere, so they never update — cheaper than a per-triangle
        # branch since bins contain mostly-live entries. The bbox test is
        # unnecessary — bin membership == bbox overlap. Same exact math as
        # rasterize_pallas._visibility_kernel.
        tri = rec_ref[k, 14].astype(jnp.int32)
        e0 = rec_ref[k, 0] * xs + rec_ref[k, 2] * ys + rec_ref[k, 4]
        e1 = rec_ref[k, 1] * xs + rec_ref[k, 3] * ys + rec_ref[k, 5]
        e2 = rec_ref[k, 6] - e0 - e1
        inside = jnp.logical_and(
            jnp.logical_and(e0 >= 0.0, e1 >= 0.0), e2 >= 0.0)
        depth = rec_ref[k, 7] * xs + rec_ref[k, 8] * ys + rec_ref[k, 9]
        cand = jnp.where(inside, depth, jnp.inf)
        better = cand < zbuf  # ascending-id order => first wins ties
        return (jnp.where(better, cand, zbuf),
                jnp.where(better, tri, idbuf))

    zbuf, idbuf = jax.lax.fori_loop(0, chunk, body, (z_ref[:], id_ref[:]),
                                    unroll=chunk)
    z_ref[:] = zbuf
    id_ref[:] = idbuf


def visibility_binned_stream(setup: TriangleSetup, *, width: int,
                             height: int, y_start=0, tile_h: int = TILE_H,
                             tile_w: int = TILE_W, chunk: int = CHUNK,
                             kmax: int = KMAX,
                             overflow_cap: int = OVERFLOW_CAP,
                             interpret: bool | None = None):
    """Binned visibility pass returning (depth, tri_id, stream); the
    stream is reused by the Pallas G-buffer resolve (gbuffer_binned)."""
    if interpret is None:
        interpret = default_interpret()
    rec = pack_records(setup, chunk)
    stream = build_bins(setup, rec, width=width, height=height,
                        y_start=y_start, tile_h=tile_h, tile_w=tile_w,
                        chunk=chunk, kmax=kmax, overflow_cap=overflow_cap)

    pad_h, pad_w = (-height) % tile_h, (-width) % tile_w
    gh, gw = (height + pad_h) // tile_h, (width + pad_w) // tile_w
    n_chunks = stream.rec.shape[0] // chunk

    kernel = functools.partial(_binned_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=chunk, gw=gw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk_tile, first_flag, y_offset
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, REC_WIDTH),
                         lambda cc, ct, ff, yo: (cc, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w),
                         lambda cc, ct, ff, yo: (ct[cc] // gw, ct[cc] % gw),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w),
                         lambda cc, ct, ff, yo: (ct[cc] // gw, ct[cc] % gw),
                         memory_space=pltpu.VMEM),
        ),
    )
    depth, tri_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(stream.chunk_tile, stream.first_flag,
      jnp.asarray(y_start, jnp.int32).reshape(1), stream.rec)
    if pad_h or pad_w:
        depth = depth[:height, :width]
        tri_id = tri_id[:height, :width]

    # Overflow pass: only taken when huge triangles exist.
    def with_overflow(args):
        depth, tri_id = args
        return visibility_pallas_merge(
            stream.overflow_rec, depth, tri_id,
            width=width, height=height, y_start=y_start,
            tile_h=tile_h, tile_w=tile_w, chunk=chunk, lex_tie=True,
            interpret=interpret)

    depth, tri_id = jax.lax.cond(
        stream.n_overflow > 0, with_overflow, lambda args: args,
        (depth, tri_id))
    return depth, tri_id, stream


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "tile_h", "tile_w",
                                    "chunk", "kmax", "overflow_cap",
                                    "interpret"))
def visibility_binned(setup: TriangleSetup, *, width: int, height: int,
                      y_start=0, tile_h: int = TILE_H, tile_w: int = TILE_W,
                      chunk: int = CHUNK, kmax: int = KMAX,
                      overflow_cap: int = OVERFLOW_CAP,
                      interpret: bool | None = None):
    """Binned visibility pass. Same contract as visibility_ref /
    visibility_pallas (golden-tested equal); scales to 100k+ triangles."""
    depth, tri_id, _ = visibility_binned_stream(
        setup, width=width, height=height, y_start=y_start, tile_h=tile_h,
        tile_w=tile_w, chunk=chunk, kmax=kmax, overflow_cap=overflow_cap,
        interpret=interpret)
    return depth, tri_id


# ---------------------------------------------------------------------------
# Deferred G-buffer resolve in Pallas.
#
# Screen-space-linear attributes (the reference's interpolation model,
# Shaders.metal:157,162) are affine planes: attr(x, y) = px*x + py*y + pc.
# Instead of per-pixel XLA gathers of per-triangle data (slow on TPU), a
# second pass over the *same binned stream* evaluates each triangle's
# attribute planes over its tile and selects them where the visibility
# buffer says that triangle won. Cost is O(overlap pairs), like the
# visibility pass, with an any(mask) early-out for fully-occluded
# triangles.
# ---------------------------------------------------------------------------

def attribute_planes(setup: TriangleSetup, attrs):
    """[T, 3, A] per-vertex attributes -> [T, 3, A] affine planes
    (rows: x, y, 1 coefficients)."""
    # planes[t, i, a] = sum_j coef[t, i, j] * attrs[t, j, a] * inv_area[t]
    # Explicit multiply-sum: stays on the VPU in f32 (tiny contraction).
    planes = jnp.sum(setup.coef[:, :, :, None] * attrs[:, None, :, :],
                     axis=2)
    return planes * setup.inv_area[:, None, None]


def pack_attr_records(planes, ids):
    """Gather attribute planes into stream order: [cap, 3A+1] f32 rows of
    (px0, py0, pc0, px1, ..., id). -1 ids become inert rows."""
    t, _, a = planes.shape
    flat = planes.transpose(0, 2, 1).reshape(t, 3 * a)  # per-channel x,y,1
    rows = jnp.where((ids >= 0)[:, None],
                     flat[jnp.clip(ids, 0, t - 1)], 0.0)
    idcol = ids.astype(jnp.float32)[:, None]
    return jnp.concatenate([rows, idcol], axis=-1)


def _resolve_kernel(ct_ref, ff_ref, yoff_ref, rec_ref, id_in_ref, gb_ref, *,
                    tile_h, tile_w, chunk, gw, n_channels):
    """One grid step = one chunk of one tile's list; gb [A, tile_h, tile_w]."""
    cc = pl.program_id(0)

    @pl.when(ff_ref[cc] == 1)
    def _init():
        gb_ref[:] = jnp.zeros((n_channels, tile_h, tile_w), jnp.float32)

    tile = ct_ref[cc]
    x0f = ((tile % gw) * tile_w).astype(jnp.float32)
    y0f = ((tile // gw) * tile_h + yoff_ref[0]).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          .astype(jnp.float32) + (x0f + 0.5))
    ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          .astype(jnp.float32) + (y0f + 0.5))
    idbuf = id_in_ref[:]

    def body(k, gb):
        # gb is a tuple of [tile_h, tile_w] channel planes (2D arrays keep
        # Mosaic on plain VPU selects; a stacked 3D carry would relayout).
        # Branchless: a per-triangle cond would copy all channel carries
        # through both branches — costlier than the selects it skips.
        # Inert rows (id -1) match no pixel (idbuf >= -1 only where
        # uncovered... uncovered pixels hold -1, so mask must exclude it).
        tri = rec_ref[k, 3 * n_channels].astype(jnp.int32)
        mask = jnp.logical_and(idbuf == tri, tri >= 0)
        return tuple(
            jnp.where(mask,
                      rec_ref[k, 3 * a] * xs
                      + rec_ref[k, 3 * a + 1] * ys
                      + rec_ref[k, 3 * a + 2],
                      gb[a])
            for a in range(n_channels))

    gb = jax.lax.fori_loop(
        0, chunk, body, tuple(gb_ref[a] for a in range(n_channels)),
        unroll=chunk)
    for a in range(n_channels):
        gb_ref[a] = gb[a]


def gbuffer_binned(stream: BinnedStream, planes, tri_id, *, width: int,
                   height: int, y_start=0, tile_h: int = TILE_H,
                   tile_w: int = TILE_W, chunk: int = CHUNK,
                   interpret: bool | None = None):
    """Evaluate the winning triangle's attribute planes per pixel.

    planes: [T, 3, A]; tri_id: [H, W] winners (from visibility_binned with
    the same stream). Returns gb [H, W, A].
    """
    if interpret is None:
        interpret = default_interpret()
    a = planes.shape[-1]
    rec_attr = pack_attr_records(planes, stream.ids)
    pad_h, pad_w = (-height) % tile_h, (-width) % tile_w
    gh, gw = (height + pad_h) // tile_h, (width + pad_w) // tile_w
    n_chunks = rec_attr.shape[0] // chunk
    tid = tri_id
    if pad_h or pad_w:
        tid = jnp.pad(tid, ((0, pad_h), (0, pad_w)), constant_values=-1)

    kernel = functools.partial(_resolve_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=chunk, gw=gw,
                               n_channels=a)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 3 * a + 1),
                         lambda cc, ct, ff, yo: (cc, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_h, tile_w),
                         lambda cc, ct, ff, yo: (ct[cc] // gw, ct[cc] % gw),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (a, tile_h, tile_w),
            lambda cc, ct, ff, yo: (0, ct[cc] // gw, ct[cc] % gw),
            memory_space=pltpu.VMEM),
    )
    gb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (a, height + pad_h, width + pad_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(stream.chunk_tile, stream.first_flag,
      jnp.asarray(y_start, jnp.int32).reshape(1), rec_attr, tid)
    gb = gb[:, :height, :width]

    # Overflow triangles also need their attributes resolved: walk the
    # overflow list once per tile, merging into the G-buffer.
    def with_overflow(gb):
        ov_rec = pack_attr_records(planes, stream.overflow_ids)
        nov_chunks = ov_rec.shape[0] // chunk
        ntiles = gh * gw
        ct = jnp.repeat(jnp.arange(ntiles, dtype=jnp.int32), nov_chunks)
        ff = jnp.tile(
            (jnp.arange(nov_chunks, dtype=jnp.int32) == 0
             ).astype(jnp.int32), ntiles)
        cyc = jnp.tile(jnp.arange(nov_chunks, dtype=jnp.int32), ntiles)
        gb_p = jnp.pad(gb, ((0, 0), (0, pad_h), (0, pad_w)))
        grid_spec2 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # ct, ff (merge flag), cyc, y_offset
            grid=(ntiles * nov_chunks,),
            in_specs=[
                pl.BlockSpec((chunk, 3 * a + 1),
                             lambda cc, ct, ff, cyc, yo: (cyc[cc], 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_h, tile_w),
                             lambda cc, ct, ff, cyc, yo:
                             (ct[cc] // gw, ct[cc] % gw),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, tile_h, tile_w),
                             lambda cc, ct, ff, cyc, yo:
                             (0, ct[cc] // gw, ct[cc] % gw),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (a, tile_h, tile_w),
                lambda cc, ct, ff, cyc, yo:
                (0, ct[cc] // gw, ct[cc] % gw),
                memory_space=pltpu.VMEM),
        )

        def merge_kernel(ct_ref, ff_ref, cyc_ref, yoff_ref, rec_ref,
                         id_in_ref, gb_in_ref, gb_ref):
            cc = pl.program_id(0)

            @pl.when(ff_ref[cc] == 1)
            def _seed():
                gb_ref[:] = gb_in_ref[:]

            tile = ct_ref[cc]
            x0f = ((tile % gw) * tile_w).astype(jnp.float32)
            y0f = ((tile // gw) * tile_h + yoff_ref[0]).astype(jnp.float32)
            xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
                  .astype(jnp.float32) + (x0f + 0.5))
            ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
                  .astype(jnp.float32) + (y0f + 0.5))
            idbuf = id_in_ref[:]

            def body(k, gb):
                tri = rec_ref[k, 3 * a].astype(jnp.int32)
                mask = jnp.logical_and(idbuf == tri, tri >= 0)
                return tuple(
                    jnp.where(mask,
                              rec_ref[k, 3 * ch] * xs
                              + rec_ref[k, 3 * ch + 1] * ys
                              + rec_ref[k, 3 * ch + 2],
                              gb[ch])
                    for ch in range(a))

            gb = jax.lax.fori_loop(
                0, chunk, body, tuple(gb_ref[ch] for ch in range(a)),
                unroll=chunk)
            for ch in range(a):
                gb_ref[ch] = gb[ch]

        out = pl.pallas_call(
            merge_kernel,
            grid_spec=grid_spec2,
            out_shape=jax.ShapeDtypeStruct(
                (a, height + pad_h, width + pad_w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(ct, ff, cyc, jnp.asarray(y_start, jnp.int32).reshape(1),
          ov_rec, tid, gb_p)
        return out[:, :height, :width]

    gb = jax.lax.cond(stream.n_overflow > 0, with_overflow,
                      lambda g: g, gb)
    return jnp.moveaxis(gb, 0, -1)  # [H, W, A]
