"""Tile binning: per-tile triangle lists built on-device, plus the binned
visibility and G-buffer resolve kernels.

This is the TPU-native answer to the reference's ROI architecture. The
reference computes per-triangle ROIs on the GPU, then *reads them back to
the CPU* and issues one rasterize dispatch per triangle over its ROI
(GpuRenderer.swift:87-138 — the mid-frame host sync SURVEY.md §3.2 flags).
Here the inverse mapping (tile -> triangles) is built entirely on-device
with one stable sort, and the raster kernels walk each tile's own triangle
list — work is O(sum of bbox-tile overlaps), not O(tiles x triangles),
with zero host round-trips.

Bin build (all inside one jit; every step gather-based — no scatters):
 1. expansion  — each triangle emits up to KMAX (tile, tri) pairs from its
    bbox tile span; triangles spanning more tiles, or past the pair
    budget, go to the *overflow* list (processed by the bbox-tested
    unbinned kernel and merged with a lexicographic (depth, id) rule —
    identical to the reference's first-drawn-wins tie semantics, but
    order-independent).
 2. argsort    — pairs sorted by tile id (stable, so each tile's list stays
    in ascending triangle order = reference encoder order).
 3. layout     — each tile's segment is padded to a CHUNK multiple and laid
    out densely; every tile owns >= 1 chunk so every output tile is
    initialized. Slots map back to sorted entries by *inverting* the
    layout (slot -> source via searchsorted), so the stream is produced by
    one gather from a combined per-triangle table (raster records +
    attribute planes) — a single [cap, W] gather feeds both kernels.
 4. kernels    — 1D grid over chunks; a scalar-prefetched chunk->tile map
    drives the output BlockSpec (the grouped/"megablox" pattern):
    consecutive chunks of one tile revisit the same VMEM block, so z/id
    (visibility) and the G-buffer channels (resolve) stay on-chip across
    the whole list. Same exact edge/depth math as ops/rasterize_pallas.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_pallas import (
    CHUNK, TILE_H, TILE_W, _poison_row, default_interpret,
    pack_records, visibility_pallas_merge,
)
from .setup import TriangleSetup

KMAX = 12            # max tiles per triangle in the binned stream
OVERFLOW_CAP = 1024  # max overflow triangles per frame
# Binned-stream pair budget, in units of T (triangle count). Small
# triangles average ~1.3 bbox-tile overlaps, so 2T of slots is generous;
# triangles past the budget spill to the overflow list (still correct,
# just slower). Keeping the stream near its *used* size matters: the
# kernel's grid covers the whole static capacity.
PAIR_BUDGET_FACTOR = 2

# Combined stream-table column layout (see build_stream_table):
# 0:2  a0 a1 | 2:4 b0 b1 | 4:6 c0 c1 | 6 Dabs | 7:10 za zb zc | 10 id
# | 11:11+3A attribute planes (x, y, const triplets per channel)
REC_BASE = 11


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinInfo:
    """Per-tile list layout (indices only; tables are gathered by callers)."""

    ids: jax.Array          # [cap] i32 global triangle ids (-1 = inert)
    chunk_tile: jax.Array   # [cap//chunk] i32 tile id per chunk
    first_flag: jax.Array   # [cap//chunk] i32 1 = first chunk of its tile
    live_flag: jax.Array    # [cap//chunk] i32 1 = chunk has live entries
    overflow_ids: jax.Array  # [ov_len] i32 overflow triangles (-1 = inert)
    n_overflow: jax.Array    # [] i32 (> overflow capacity => dropped,
    #                             surfaced as a diagnostic)


def build_bins(setup: TriangleSetup, *, width: int, height: int,
               y_start=0, tile_h: int = TILE_H, tile_w: int = TILE_W,
               chunk: int = CHUNK, kmax: int = KMAX,
               overflow_cap: int = OVERFLOW_CAP) -> BinInfo:
    """Build per-tile triangle lists from triangle bboxes."""
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
    # budget spill to the overflow list.
    budget_pairs = -(-PAIR_BUDGET_FACTOR * max(t, 1) // chunk) * chunk
    cum_pairs = jnp.cumsum(jnp.where(small, nspan, 0))
    binned = small & (cum_pairs <= budget_pairs)
    overflow = valid & ~binned

    # 1. Expansion: pair k of triangle covers tile (ty0 + k // span_w,
    #    tx0 + k % span_w).
    k = jnp.arange(kmax, dtype=jnp.int32)
    dx = k[None, :] % span_w[:, None]
    dy = k[None, :] // span_w[:, None]
    tile = (ty0[:, None] + dy) * gw + (tx0[:, None] + dx)  # [T, kmax]
    pair_valid = binned[:, None] & (k[None, :] < nspan[:, None])
    keys = jnp.where(pair_valid, tile, ntiles).reshape(-1)  # [T*kmax]

    # 2.+3. Sorted, chunk-aligned layout WITHOUT any scatter (XLA TPU
    # scatter of 400k indices measured ~8 ms — slower than two sorts).
    # (tile, entry-index) pairs are packed into one int32 (stability comes
    # free from the low-order index bits; plain value sort beats key/value
    # argsort):
    #   sort #1 over the real pairs gives per-tile counts;
    #   per-tile alignment *filler* entries (exactly pad_counts - counts
    #   of them, keyed by their tile; the rest keyed past the sentinel)
    #   are appended and sort #2 produces the final padded layout
    #   directly — slot ids decode arithmetically from the packed values.
    n_pairs = t * kmax
    n_fill = ntiles * chunk
    n_all = n_pairs + n_fill
    pairs_cap = min(int(budget_pairs), -(-n_pairs // chunk) * chunk)
    cap = pairs_cap + n_fill
    idx_bits = max(n_all - 1, 1).bit_length()
    tile_bits = (ntiles + 2).bit_length()
    assert idx_bits + tile_bits <= 31, (
        f"scene too large for packed binning keys: {t} triangles x {kmax} "
        f"+ {ntiles} tiles x {chunk} needs {idx_bits + tile_bits} bits")

    packed = (keys << idx_bits) | jnp.arange(n_pairs, dtype=jnp.int32)
    sorted1 = jnp.sort(packed)
    sorted_keys = sorted1 >> idx_bits

    tile_range = jnp.arange(ntiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_keys, tile_range,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_keys, tile_range,
                            side="right").astype(jnp.int32)
    counts = ends - starts
    pad_counts = jnp.maximum(-(-counts // chunk), 1) * chunk
    pad_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)[:-1]])

    # Filler entries: chunk per tile, the first (pad_counts - counts) keyed
    # by their tile (they sort right after the tile's real entries — their
    # indices are >= n_pairs), the rest keyed ntiles+1 (past everything).
    f = jnp.arange(n_fill, dtype=jnp.int32)
    f_tile = f // chunk
    f_active = (f % chunk) < (pad_counts - counts)[f_tile]
    f_keys = jnp.where(f_active, f_tile, ntiles + 1)
    f_packed = (f_keys << idx_bits) | (n_pairs + f)
    parts = [sorted1, f_packed]
    if n_all < cap:  # tiny scenes: pad with sentinels so the slice fits
        parts.append(jnp.full((cap - n_all,),
                              ((ntiles + 1) << idx_bits), jnp.int32))
    sorted2 = jnp.sort(jnp.concatenate(parts))[:cap]

    # Decode: real entries map back to their triangle, fillers to -1.
    # Entries beyond a tile's active region (budget tail / sentinel) also
    # decode to -1 via the key check.
    s_idx = sorted2 & ((1 << idx_bits) - 1)
    s_key = sorted2 >> idx_bits
    ids = jnp.where((s_idx < n_pairs) & (s_key < ntiles),
                    s_idx // kmax, -1).astype(jnp.int32)

    # Chunk -> tile map + first-chunk flags (scalar prefetch for the
    # kernels' output BlockSpecs). Tail chunks (beyond the last used one)
    # resolve to the last tile with flag 0: no DMA switch, no live work.
    n_chunks = cap // chunk
    cc = jnp.arange(n_chunks, dtype=jnp.int32)
    chunk_starts = pad_starts // chunk
    chunk_tile = (jnp.searchsorted(chunk_starts, cc, side="right") - 1
                  ).astype(jnp.int32)
    ct_c = jnp.clip(chunk_tile, 0, ntiles - 1)
    first_flag = (cc == chunk_starts[ct_c]).astype(jnp.int32)
    # Live = this chunk overlaps its tile's real (unpadded) entries; dead
    # chunks (per-tile padding tails + the global tail) skip their whole
    # triangle loop (~40% of slots for typical scenes).
    live_flag = (cc * chunk < pad_starts[ct_c] + counts[ct_c]
                 ).astype(jnp.int32)

    # Overflow list: ascending triangle id (reference draw order); fixed
    # chunk-aligned length regardless of T.
    ov_len = -(-min(overflow_cap, max(t, 1)) // chunk) * chunk
    ov_key = jnp.where(overflow, jnp.arange(t, dtype=jnp.int32), t)
    ov_sorted = jnp.full((ov_len,), t, jnp.int32).at[
        : min(t, ov_len)].set(jnp.sort(ov_key)[: min(t, ov_len)])
    ov_ids = jnp.where(ov_sorted < t, ov_sorted, -1)
    return BinInfo(ids=ids, chunk_tile=chunk_tile, first_flag=first_flag,
                   live_flag=live_flag, overflow_ids=ov_ids,
                   n_overflow=jnp.sum(overflow.astype(jnp.int32)))


# ---------------------------------------------------------------------------
# Combined stream table: raster records + attribute planes, gathered into
# bin order ONCE and consumed by both kernels below.
#
# Screen-space-linear attributes (the reference's interpolation model,
# Shaders.metal:157,162) are affine planes: attr(x, y) = px*x + py*y + pc,
# so the deferred resolve needs no per-pixel gathers at all.
# ---------------------------------------------------------------------------

def attribute_planes(setup: TriangleSetup, attrs):
    """[T, 3, A] per-vertex attribute values -> [T, A, 3] affine planes
    (x, y, const coefficients per channel)."""
    # planes[t, a, i] = sum_j coef[t, i, j] * attrs[t, j, a] * inv_area[t]
    # Explicit multiply-sum: stays on the VPU in f32 (tiny contraction).
    planes = jnp.sum(
        setup.coef[:, None, :, :]          # [T, 1, i, j]
        * attrs.transpose(0, 2, 1)[:, :, None, :],  # [T, A, 1, j]
        axis=-1,
    )  # [T, A, i]
    return planes * setup.inv_area[:, None, None]


def build_stream_table(setup: TriangleSetup, attrs=None):
    """[T, REC_BASE + 3A] combined table: edge/depth record + id + planes.

    attrs: optional [T, 3, A] per-vertex attribute values.
    Returns (table, n_channels, poison_row).
    """
    t = setup.num_triangles
    abs_d = jnp.abs(setup.area2) * setup.valid
    cols = [
        setup.coef[:, 0, 0:2],        # a0 a1
        setup.coef[:, 1, 0:2],        # b0 b1
        setup.coef[:, 2, 0:2],        # c0 c1
        abs_d[:, None],               # |D|
        setup.zplane,                 # za zb zc
        jnp.arange(t, dtype=jnp.float32)[:, None],  # global id
    ]
    a = 0
    if attrs is not None:
        a = attrs.shape[-1]
        planes = attribute_planes(setup, attrs)  # [T, A, 3]
        cols.append(planes.reshape(t, 3 * a))
    table = jnp.concatenate(cols, axis=-1)
    poison = jnp.zeros((REC_BASE + 3 * a,), jnp.float32)
    poison = poison.at[4:6].set(-1.0)   # c0 = c1 = -1: outside everywhere
    poison = poison.at[9].set(jnp.inf)  # zc = +inf
    poison = poison.at[10].set(-1.0)    # id = -1
    table = jnp.where(setup.valid[:, None], table, poison)
    return table, a, poison


def gather_stream(table, ids, poison):
    """Gather table rows into stream order; -1 ids become poison rows."""
    rows = table[jnp.clip(ids, 0, table.shape[0] - 1)]
    return jnp.where((ids >= 0)[:, None], rows, poison)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _tile_coords(tile, yoff, gw, tile_h, tile_w):
    x0f = ((tile % gw) * tile_w).astype(jnp.float32)
    y0f = ((tile // gw) * tile_h + yoff).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          .astype(jnp.float32) + (x0f + 0.5))
    ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          .astype(jnp.float32) + (y0f + 0.5))
    return xs, ys


def _binned_vis_kernel(ct_ref, ff_ref, lv_ref, yoff_ref, rec_ref, z_ref,
                       id_ref, *, tile_h, tile_w, chunk, gw):
    """One grid step = one chunk of one tile's triangle list."""
    cc = pl.program_id(0)

    @pl.when(ff_ref[cc] == 1)
    def _init():
        z_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
        id_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    xs, ys = _tile_coords(ct_ref[cc], yoff_ref[0], gw, tile_h, tile_w)

    def body(k, carry):
        zbuf, idbuf = carry
        # Branchless: poison records (padding/tail) have e0 < 0 everywhere
        # so they never update. Bin membership == bbox overlap, so no bbox
        # test either. Same exact math as rasterize_pallas.
        tri = rec_ref[k, 10].astype(jnp.int32)
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

    @pl.when(lv_ref[cc] == 1)
    def _work():
        zbuf, idbuf = jax.lax.fori_loop(
            0, chunk, body, (z_ref[:], id_ref[:]), unroll=chunk)
        z_ref[:] = zbuf
        id_ref[:] = idbuf


def _resolve_body(rec_ref, idbuf, xs, ys, chunk, n_channels):
    def body(k, gb):
        # gb is a tuple of [tile_h, tile_w] channel planes (2D keeps Mosaic
        # on plain VPU selects). Branchless: a per-triangle cond would copy
        # all channel carries through both branches. tri >= 0 guard keeps
        # inert rows from matching uncovered (-1) pixels.
        tri = rec_ref[k, REC_BASE - 1].astype(jnp.int32)
        mask = jnp.logical_and(idbuf == tri, tri >= 0)
        return tuple(
            jnp.where(mask,
                      rec_ref[k, REC_BASE + 3 * a] * xs
                      + rec_ref[k, REC_BASE + 3 * a + 1] * ys
                      + rec_ref[k, REC_BASE + 3 * a + 2],
                      gb[a])
            for a in range(n_channels))

    return body


def _resolve_kernel(ct_ref, ff_ref, lv_ref, yoff_ref, rec_ref, id_in_ref,
                    gb_ref, *, tile_h, tile_w, chunk, gw, n_channels):
    cc = pl.program_id(0)

    @pl.when(ff_ref[cc] == 1)
    def _init():
        gb_ref[:] = jnp.zeros((n_channels, tile_h, tile_w), jnp.float32)

    @pl.when(lv_ref[cc] == 1)
    def _work():
        xs, ys = _tile_coords(ct_ref[cc], yoff_ref[0], gw, tile_h, tile_w)
        body = _resolve_body(rec_ref, id_in_ref[:], xs, ys, chunk,
                             n_channels)
        gb = jax.lax.fori_loop(
            0, chunk, body, tuple(gb_ref[a] for a in range(n_channels)),
            unroll=chunk)
        for a in range(n_channels):
            gb_ref[a] = gb[a]


def _resolve_merge_kernel(ct_ref, ff_ref, cyc_ref, lv_ref, yoff_ref,
                          rec_ref, id_in_ref, gb_in_ref, gb_ref, *, tile_h,
                          tile_w, chunk, gw, n_channels):
    """Overflow resolve: per tile, walk the (replicated) overflow stream,
    seeding the G-buffer from the binned pass output."""
    cc = pl.program_id(0)

    @pl.when(ff_ref[cc] == 1)
    def _seed():
        gb_ref[:] = gb_in_ref[:]

    xs, ys = _tile_coords(ct_ref[cc], yoff_ref[0], gw, tile_h, tile_w)
    body = _resolve_body(rec_ref, id_in_ref[:], xs, ys, chunk, n_channels)
    gb = jax.lax.fori_loop(
        0, chunk, body, tuple(gb_ref[a] for a in range(n_channels)),
        unroll=chunk)
    for a in range(n_channels):
        gb_ref[a] = gb[a]


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _grid_geometry(width, height, tile_h, tile_w):
    pad_h, pad_w = (-height) % tile_h, (-width) % tile_w
    return pad_h, pad_w, (height + pad_h) // tile_h, (width + pad_w) // tile_w


def binned_pipeline(setup: TriangleSetup, attrs=None, *, width: int,
                    height: int, y_start=0, tile_h: int = TILE_H,
                    tile_w: int = TILE_W, chunk: int = CHUNK,
                    kmax: int = KMAX, overflow_cap: int = OVERFLOW_CAP,
                    interpret: bool | None = None):
    """Full binned raster path.

    attrs: optional [T, 3, A] per-vertex attribute values to interpolate.
    Returns (depth [H, W], tri_id [H, W], gbuffer [H, W, A] or None).
    """
    if interpret is None:
        interpret = default_interpret()
    info = build_bins(setup, width=width, height=height, y_start=y_start,
                      tile_h=tile_h, tile_w=tile_w, chunk=chunk, kmax=kmax,
                      overflow_cap=overflow_cap)
    table, a, poison = build_stream_table(setup, attrs)
    stream = gather_stream(table, info.ids, poison)
    wtot = table.shape[-1]

    pad_h, pad_w, gh, gw = _grid_geometry(width, height, tile_h, tile_w)
    n_chunks = stream.shape[0] // chunk
    yoff = jnp.asarray(y_start, jnp.int32).reshape(1)
    tile_idx = lambda cc, ct, ff, lv, yo: (ct[cc] // gw, ct[cc] % gw)

    # --- visibility pass --------------------------------------------------
    vis_kernel = functools.partial(_binned_vis_kernel, tile_h=tile_h,
                                   tile_w=tile_w, chunk=chunk, gw=gw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # chunk_tile, first_flag, live_flag, y_off
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, wtot),
                         lambda cc, ct, ff, lv, yo: (cc, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), tile_idx,
                         memory_space=pltpu.VMEM),
        ),
    )
    depth, tri_id = pl.pallas_call(
        vis_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((height + pad_h, width + pad_w),
                                 jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(info.chunk_tile, info.first_flag, info.live_flag, yoff, stream)
    depth_s = depth[:height, :width] if (pad_h or pad_w) else depth
    tri_id_s = tri_id[:height, :width] if (pad_h or pad_w) else tri_id

    # --- overflow visibility (rare; lex (depth, id) tie merge) -------------
    def vis_with_overflow(args):
        d, i = args
        # Built inside the cond branch: costs nothing when there is no
        # overflow.
        ov_rec16 = gather_stream(pack_records(setup, chunk),
                                 info.overflow_ids, _poison_row())
        return visibility_pallas_merge(
            ov_rec16, d, i, width=width, height=height, y_start=y_start,
            n_live=info.n_overflow,
            tile_h=tile_h, tile_w=tile_w, chunk=chunk, lex_tie=True,
            interpret=interpret)

    depth_s, tri_id_s = jax.lax.cond(
        info.n_overflow > 0, vis_with_overflow, lambda args: args,
        (depth_s, tri_id_s))

    if a == 0:
        return depth_s, tri_id_s, None

    # --- G-buffer resolve pass ---------------------------------------------
    tid_p = tri_id_s
    if pad_h or pad_w:
        tid_p = jnp.pad(tid_p, ((0, pad_h), (0, pad_w)),
                        constant_values=-1)
    res_kernel = functools.partial(_resolve_kernel, tile_h=tile_h,
                                   tile_w=tile_w, chunk=chunk, gw=gw,
                                   n_channels=a)
    grid_spec_r = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, wtot),
                         lambda cc, ct, ff, lv, yo: (cc, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_h, tile_w), tile_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (a, tile_h, tile_w),
            lambda cc, ct, ff, lv, yo: (0, ct[cc] // gw, ct[cc] % gw),
            memory_space=pltpu.VMEM),
    )
    gb = pl.pallas_call(
        res_kernel,
        grid_spec=grid_spec_r,
        out_shape=jax.ShapeDtypeStruct(
            (a, height + pad_h, width + pad_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(info.chunk_tile, info.first_flag, info.live_flag, yoff, stream,
      tid_p)
    gb = gb[:, :height, :width]

    # --- overflow resolve (rare) --------------------------------------------
    def gb_with_overflow(gb):
        ov_stream = gather_stream(table, info.overflow_ids, poison)
        nov_chunks = ov_stream.shape[0] // chunk
        ntiles = gh * gw
        ct = jnp.repeat(jnp.arange(ntiles, dtype=jnp.int32), nov_chunks)
        ff = jnp.tile((jnp.arange(nov_chunks, dtype=jnp.int32) == 0
                       ).astype(jnp.int32), ntiles)
        cyc = jnp.tile(jnp.arange(nov_chunks, dtype=jnp.int32), ntiles)
        lv = (cyc * chunk < info.n_overflow).astype(jnp.int32)
        gb_p = jnp.pad(gb, ((0, 0), (0, pad_h), (0, pad_w)))
        merge_kernel = functools.partial(
            _resolve_merge_kernel, tile_h=tile_h, tile_w=tile_w,
            chunk=chunk, gw=gw, n_channels=a)
        grid_spec_m = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # ct, ff, cyc, lv, y_offset
            grid=(ntiles * nov_chunks,),
            in_specs=[
                pl.BlockSpec((chunk, wtot),
                             lambda cc, ct, ff, cyc, lv, yo: (cyc[cc], 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_h, tile_w),
                             lambda cc, ct, ff, cyc, lv, yo:
                             (ct[cc] // gw, ct[cc] % gw),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, tile_h, tile_w),
                             lambda cc, ct, ff, cyc, lv, yo:
                             (0, ct[cc] // gw, ct[cc] % gw),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (a, tile_h, tile_w),
                lambda cc, ct, ff, cyc, lv, yo:
                (0, ct[cc] // gw, ct[cc] % gw),
                memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            merge_kernel,
            grid_spec=grid_spec_m,
            out_shape=jax.ShapeDtypeStruct(
                (a, height + pad_h, width + pad_w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(ct, ff, cyc, lv, yoff, ov_stream, tid_p, gb_p)
        return out[:, :height, :width]

    gb = jax.lax.cond(info.n_overflow > 0, gb_with_overflow,
                      lambda g: g, gb)
    return depth_s, tri_id_s, jnp.moveaxis(gb, 0, -1)


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
    depth, tri_id, _ = binned_pipeline(
        setup, None, width=width, height=height, y_start=y_start,
        tile_h=tile_h, tile_w=tile_w, chunk=chunk, kmax=kmax,
        overflow_cap=overflow_cap, interpret=interpret)
    return depth, tri_id
