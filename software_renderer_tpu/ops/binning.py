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
 1. compact emission — each binned triangle owns the pair-slot interval
    [starts[t], starts[t] + nspan[t]) of a [budget]-sized slot array
    (starts = exact exclusive cumsum of the bbox tile spans, two
    triangular matmuls on the MXU); slot -> (triangle, k) resolves with
    one searchsorted + one row gather, so the emission is ALREADY
    compacted to the pair budget — the sort input is ~t*avg_span keys,
    not t*KMAX (9x smaller at 1080p/100k; the full [T, kmax] emission
    sort measured +4.5 ms/frame, the compacted one ~1.5 ms). Triangles
    spanning more tiles than kmax, or past the pair budget, go to the
    *overflow* list (processed by the bbox-tested unbinned kernel and
    merged with a lexicographic (depth, id) rule — identical to the
    reference's first-drawn-wins tie semantics, but order-independent).
 2. argsort    — pairs sorted by tile id (stable, so each tile's list stays
    in ascending triangle order = reference encoder order).
 3. layout     — each tile's segment is padded to a CHUNK multiple and laid
    out densely; every tile owns >= 1 chunk so every output tile is
    initialized. Real pairs plus per-tile alignment fillers sort directly
    into the final padded layout (per-tile counts from one rectangle
    matmul), so the stream is produced by one gather from a combined
    per-triangle table (raster records + attribute planes) — a single
    [cap, W] gather feeds both kernels.
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
    effective_chunk, pack_records, visibility_pallas_merge,
)
from .setup import TriangleSetup

# Max tiles per triangle in the binned stream. The T*KMAX emission is the
# bin-build sort's input, so KMAX is ~proportional to its cost — but any
# frame with a single spilled triangle pays the overflow branch (an id
# sort + merge waves + a seeded kernel pass, ~+3 ms), and the bench
# averages frames per timing sample, so spill FREQUENCY matters more than
# spill size: kmax 8 (spills at many angles) measured 4 ms/frame WORSE
# than kmax 12 (spill-free across the animation) despite its smaller sort.
KMAX = 12

# tools/measure_srcexp.py flips these to price the slot->triangle
# searchsorted in-pipeline. _FAKE_SRC substitutes a same-shape wrong
# expansion (changes the live-pair population — measures an upper bound
# on the whole expansion chain, NOT the searchsorted alone). _EXTRA_SRC
# adds a second, result-identical searchsorted (side='left', folded in
# by a max() that provably returns the real src) — the in-pipeline
# delta vs baseline prices ONE searchsorted with identical downstream
# work. Never set in production.
_FAKE_SRC_FOR_PROFILING = False
_EXTRA_SRC_FOR_PROFILING = False
OVERFLOW_CAP = 1024  # overflow triangles per merge wave
# Binned-stream pair budget, in units of T (triangle count). Small
# triangles average ~1.3 bbox-tile overlaps; triangles past the budget
# spill to the overflow waves (still correct, just slower). Keeping the
# stream near its *used* size matters doubly: the kernel's grid covers the
# whole static capacity, and the stream-table row gather (~the cost of
# 3 ms per 150k rows on v5e) scales with it.
PAIR_BUDGET_FACTOR = 1.5

# Combined stream-table column layout (see build_stream_table):
# 0:2  a0 a1 | 2:4 b0 b1 | 4:6 c0 c1 | 6 Dabs | 7:10 za zb zc | 10 id
# | 11:11+3A attribute planes (x, y, const triplets per channel)
REC_BASE = 11


def _inclusive_cumsum_mm(x, t_kmax_max: int):
    """Exact inclusive cumsum of a non-negative i32 [T] array.

    Two triangular-mask matmuls (within 256-blocks + across block sums) —
    the same MXU pattern as :func:`live_first_permutation`. Exact in f32
    while the total stays < 2^24; callers whose worst-case total
    (``t_kmax_max``) can exceed that get the plain (slower, log-depth)
    ``jnp.cumsum`` instead. A [T] jnp.cumsum measured ~1.7 ms at T=100k
    on v5e; the matmul form is noise.
    """
    if t_kmax_max >= (1 << 24):
        return jnp.cumsum(x)
    t = x.shape[0]
    blk = 256
    tp = -(-t // blk) * blk
    hi = jax.lax.Precision.HIGHEST
    xp = jnp.zeros((tp,), jnp.float32).at[:t].set(x.astype(jnp.float32))
    xb = xp.reshape(-1, blk)
    nb = xb.shape[0]
    jj = jnp.arange(blk)
    incl = (jj[:, None] <= jj[None, :]).astype(jnp.float32)
    within = jax.lax.dot(xb, incl, precision=hi)      # [nb, blk] inclusive
    bsum = within[:, -1]
    bb = jnp.arange(nb)
    before = (bb[:, None] > bb[None, :]).astype(jnp.float32)
    boff = jax.lax.dot(before, bsum, precision=hi)    # [nb] exclusive
    return (within + boff[:, None]).reshape(-1)[:t].astype(x.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinInfo:
    """Per-tile list layout (indices only; tables are gathered by callers)."""

    ids: jax.Array          # [cap] i32 global triangle ids (-1 = inert)
    chunk_tile: jax.Array   # [cap//chunk] i32 tile id per chunk
    first_flag: jax.Array   # [cap//chunk] i32 1 = first chunk of its tile
    live_flag: jax.Array    # [cap//chunk] i32 1 = chunk has live entries
    last_flag: jax.Array    # [cap//chunk] i32 1 = last chunk of its tile
    overflow_mask: jax.Array  # [T] bool — triangle spilled (span > kmax or
    #   past the pair budget). The merge loops sort/compact this lazily
    #   inside their overflow-only branch (a TPU sort costs ~3 ms even for
    #   small arrays — too much to pay on spill-free frames) and process
    #   waves of ov_len, so nothing is ever dropped.
    n_overflow: jax.Array    # [] i32 total overflow triangles
    group_band: jax.Array | None = None  # [cap//glen] i32 band-in-tile per
    #   glen-record group (band-partitioned layout only; None when bands=1)


def build_bins(setup: TriangleSetup, *, width: int, height: int,
               y_start=0, tile_h: int = TILE_H, tile_w: int = TILE_W,
               chunk: int = CHUNK, kmax: int = KMAX,
               overflow_cap: int = OVERFLOW_CAP,
               pair_budget_factor: float = PAIR_BUDGET_FACTOR,
               prune: bool = False, bands: int = 1,
               glen: int = 16) -> BinInfo:
    """Build per-tile triangle lists from triangle bboxes.

    pair_budget_factor: static stream capacity, in units of T. The cap is
    a *perf* knob, not a correctness one (overrun spills to the overflow
    waves, which render exactly). Backface-culled scenes average ~0.5-0.6
    real pairs per input triangle, so callers with culling on pass a
    smaller factor — the kernel grid, the stream gather, and the dead-slot
    walk all scale with this capacity (render.py passes 0.75).

    prune: exact tile-corner pair pruning. Semantically a no-op (pruned
    pairs provably cover zero pixels); OFF by default because the strided
    [T, 3, 3] coefficient slices broadcast over the [T, kmax] emission
    measured +5 ms at 1080p/100k on v5e — re-enable once TriangleSetup
    carries planar edge columns (docs/PERF.md backlog).

    bands: band-partitioned layout for the fused kernel. Each tile is
    split into ``bands`` horizontal bands of tile_h/bands rows; pairs are
    binned per (tile, band) and each tile's list is grouped by band in
    ``glen``-record groups (BinInfo.group_band maps groups to bands), so
    the kernel walks each record over a [band_h, tile_w] slab instead of
    the whole tile — ~bands× less VPU work per record, paid for by the
    taller-span pair growth (a triangle covering r rows of bands emits r
    records per tile column). kmax is in (tile, band)-pair units when
    bands > 1. Pixel results are bit-identical at any ``bands``: a pixel
    belongs to exactly one band, and its band's list preserves ascending
    triangle order, so the candidate sequence per pixel is unchanged.
    """
    t = setup.num_triangles
    gh = -(-height // tile_h)
    gw = -(-width // tile_w)
    ntiles = gh * gw
    assert tile_h % bands == 0 and (tile_h // bands) % 8 == 0, (
        f"bands={bands} must split tile_h={tile_h} into 8-row-aligned "
        "slabs (Mosaic sublane alignment)")
    assert chunk % glen == 0, (glen, chunk)
    nbins = ntiles * bands
    bh = tile_h // bands
    gbands = gh * bands

    # Accepts the array TriangleSetup or the planar front-end's
    # PlanarSetup (ops/frontend.py) — the latter's bbox columns are
    # already separate [T] arrays (no strided narrow-minor slices).
    from .frontend import PlanarSetup
    if isinstance(setup, PlanarSetup):
        bbx0, bby0, bbx1, bby1 = setup.bx0, setup.by0, setup.bx1, setup.by1
        coef_col = lambda row, j: (
            (setup.a0, setup.a1, setup.a2),
            (setup.b0, setup.b1, setup.b2),
            (setup.c0, setup.c1, setup.c2))[row][j]
    else:
        bbox = setup.bbox  # [T, 4] x0 y0 x1 y1, clamped to the viewport
        bbx0, bby0, bbx1, bby1 = (bbox[:, 0], bbox[:, 1], bbox[:, 2],
                                  bbox[:, 3])
        coef_col = lambda row, j: setup.coef[:, row, j]
    y0g = jnp.asarray(y_start, jnp.int32)
    # Tile span in this slice's tile grid (global rows shifted by y_start).
    # With bands > 1 the vertical unit is a band row (bh = tile_h/bands);
    # bands == 1 reduces to the plain tile grid.
    tx0 = bbx0 // tile_w
    tx1 = bbx1 // tile_w
    ty0 = jnp.clip((bby0 - y0g) // bh, 0, gbands - 1)
    ty1 = jnp.clip((bby1 - y0g) // bh, 0, gbands - 1)
    in_slice = (bby1 >= y0g) & (bby0 < y0g + gh * tile_h)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    nspan = span_w * span_h
    valid = setup.valid & in_slice
    # Numerically UNSAFE triangles (coverage not provably inside the bbox
    # — adversarial slivers with far-offscreen vertices, ops/setup.py
    # coverage_safe) spill to the overflow kernels, which clamp coverage
    # to the bbox per record; the hot fused walk then needs no per-record
    # bbox test (safe triangles' coverage can't escape their emitted
    # tiles by construction).
    small = valid & (nspan <= kmax) & setup.safe
    # Pair budget: triangles whose cumulative pair demand exceeds the
    # budget spill to the overflow list (exact per-triangle prefix — the
    # matmul cumsum costs ~nothing, unlike the ~1.7 ms [T] jnp.cumsum the
    # earlier block-granular prefix avoided). The cutoff is monotone: once
    # the prefix passes the budget every later triangle spills too, so
    # the binned set owns one contiguous slot range per triangle.
    budget_pairs = -(int(-pair_budget_factor * max(t, 1)) // chunk) * chunk
    nsp = jnp.where(small, nspan, 0)
    cum = _inclusive_cumsum_mm(nsp, t * kmax)
    binned = small & (cum <= budget_pairs)
    overflow = valid & ~binned
    # Exclusive slot starts over the *binned* set (plateaus after the
    # budget cutoff — still sorted, which searchsorted below requires).
    nspb = jnp.where(binned, nspan, 0)
    sb = _inclusive_cumsum_mm(nspb, t * kmax) - nspb

    # 2. Per-tile pair counts WITHOUT sorting: a binned triangle covers a
    #    rectangle of tiles, so counts[ty, tx] = sum_t rowmask[t, ty] *
    #    colmask[t, tx] — one tiny [gh, T] @ [T, gw] matmul on the MXU
    #    (f32 HIGHEST: counts < 2^24, exact). Replaces a full sort of the
    #    pair keys (a TPU sort has ~3 ms of fixed cost at any size).
    rows = jnp.arange(gbands, dtype=jnp.int32)
    cols = jnp.arange(gw, dtype=jnp.int32)
    rowmask = ((rows[None, :] >= ty0[:, None])
               & (rows[None, :] <= ty1[:, None])
               & binned[:, None]).astype(jnp.float32)
    colmask = ((cols[None, :] >= tx0[:, None])
               & (cols[None, :] <= tx1[:, None])).astype(jnp.float32)
    counts = jnp.dot(rowmask.T, colmask,
                     precision=jax.lax.Precision.HIGHEST
                     ).astype(jnp.int32)  # [gbands, gw]
    if bands > 1:
        # Reorder band-row-major -> (tile row, col, band): bins of one
        # tile must be contiguous in key order so the kernel's chunk->tile
        # output-block revisits stay consecutive (DMA elision).
        counts = counts.reshape(gh, bands, gw).transpose(0, 2, 1)
    counts = counts.reshape(nbins)

    pairs_cap = min(int(budget_pairs), -(-(t * kmax) // chunk) * chunk)
    id_bits = (t + 1).bit_length()  # ids 0..t-1; t = filler sentinel
    tile_bits = (nbins + 2).bit_length()
    # Static-shape feasibility; callers check packed_keys_fit() and route
    # to the unbinned kernel instead of hitting this.
    assert id_bits + tile_bits <= 31, (
        f"scene too large for packed binning keys: {t} triangles over "
        f"{nbins} bins needs {id_bits + tile_bits} bits")
    tri_ids = jnp.arange(t, dtype=jnp.int32)

    if not prune:
        # 1. Compact emission: slot s of the [pairs_cap] slot array belongs
        #    to the binned triangle whose interval [sb, sb + nspan) covers
        #    s; pair k = s - sb[src] covers tile (ty0 + k // span_w,
        #    tx0 + k % span_w). One searchsorted + ONE row gather of a
        #    [T, 6] emission table resolve every slot — no [T, kmax]
        #    arrays exist at all, and the sort below sees pairs_cap keys
        #    (~t*avg_span), not t*kmax (the full-emission sort of 1.26M
        #    keys measured +4.5 ms/frame at 1080p/100k on v5e; this form
        #    ~1.5 ms).
        etab = jnp.stack([sb, tx0, ty0, span_w, nspb, tri_ids],
                         axis=-1)  # [T, 6]
        slots = jnp.arange(pairs_cap, dtype=jnp.int32)
        # method='sort': ONE extra [T + cap] merge-sort instead of the
        # default binary search, whose log2(T) rounds of scalar gathers
        # measured ~10 ms at these sizes (TPU gathers are the enemy;
        # sorts are cheap).
        if _FAKE_SRC_FOR_PROFILING:
            # Measurement-only (tools/measure_srcexp.py): stand in a
            # same-shape WRONG expansion to price the searchsorted line
            # in-pipeline. Never set in production.
            src = slots % t
        else:
            src = (jnp.searchsorted(sb, slots, side="right",
                                    method="sort").astype(jnp.int32) - 1)
            if _EXTRA_SRC_FOR_PROFILING:
                # Measurement-only: one more searchsorted whose result
                # folds to exactly src (src2 - 2t < -t <= -1 <= src, so
                # the max is always src), pricing the line in-pipeline
                # with unchanged downstream work.
                src2 = jnp.searchsorted(sb, slots, side="left",
                                        method="sort").astype(jnp.int32)
                src = jnp.maximum(src, src2 - 2 * t)
        erow = etab[jnp.clip(src, 0, t - 1)]  # [pairs_cap, 6]
        k = slots - erow[:, 0]
        live = (src >= 0) & (k < erow[:, 4])
        dx = jnp.where(live, k % jnp.maximum(erow[:, 3], 1), 0)
        dy = jnp.where(live, k // jnp.maximum(erow[:, 3], 1), 0)
        gb = erow[:, 2] + dy              # band row (== tile row, bands=1)
        if bands > 1:
            bin_c = ((gb // bands) * gw + (erow[:, 1] + dx)) * bands \
                + gb % bands
        else:
            bin_c = gb * gw + (erow[:, 1] + dx)
        keys_c = jnp.where(live, bin_c, nbins + 1)
        idpart = jnp.where(live, erow[:, 5], t)
        packed = (keys_c << id_bits) | idpart
    else:
        assert bands == 1, "prune path does not support band partitioning"
        # 1'. Full [T, kmax] emission — kept for the exact tile-corner
        #    prune, which tests every pair against the triangle's edge
        #    functions (a pair-level test needs the pairs materialized).
        #    Pruned pairs become per-tile *fillers* (key = tile, id =
        #    sentinel) so the layout still matches the rectangle counts
        #    matmul; they cost one inert slot instead of a kernel record
        #    walk. OFF by default: the strided [T, 3, 3] coefficient
        #    slices broadcast over [T, kmax] measured +5 ms at 1080p/100k.
        k = jnp.arange(kmax, dtype=jnp.int32)
        dx = k[None, :] % span_w[:, None]
        dy = k[None, :] // span_w[:, None]
        tile = (ty0[:, None] + dy) * gw + (tx0[:, None] + dx)  # [T, kmax]
        pair_valid = binned[:, None] & (k[None, :] < nspan[:, None])
        px0 = ((tx0[:, None] + dx) * tile_w).astype(jnp.float32) + 0.5
        py0 = ((ty0[:, None] + dy) * tile_h + y0g).astype(jnp.float32) + 0.5
        px1 = px0 + (tile_w - 1)
        py1 = py0 + (tile_h - 1)
        overlap = pair_valid
        for j in range(3):
            a = coef_col(0, j)[:, None]
            b = coef_col(1, j)[:, None]
            c = coef_col(2, j)[:, None]
            emax = (a * jnp.where(a >= 0.0, px1, px0)
                    + b * jnp.where(b >= 0.0, py1, py0) + c)
            overlap = overlap & (emax >= 0.0)
        pruned = pair_valid & ~overlap
        pair_valid = overlap
        keys = jnp.where(pair_valid | pruned, tile, ntiles)  # [T, kmax]
        idpart = jnp.where(pruned, t, tri_ids[:, None])
        packed_full = ((keys << id_bits) | idpart).reshape(-1)
        # Compact the full emission to pairs_cap keys with ONE small
        # top-k-style sort-free prefix? No — the prune path keeps the
        # full sort (it is the measurement baseline and prune is off by
        # default).
        packed = packed_full

    # 3. Sorted, chunk-aligned layout with ONE sort and no scatter (XLA
    #    TPU scatter of 400k indices measured ~8 ms). (tile, triangle-id)
    #    pairs pack into one int32 — a triangle's pairs go to *distinct*
    #    tiles (rectangle enumeration), so (tile, id) is unique, and the
    #    low-order id bits keep each tile's list in ascending triangle
    #    order (= reference encoder order) for free. Real pairs plus
    #    exactly (pad_counts - counts) per-tile alignment *filler* entries
    #    (keyed by their tile with the sentinel id, sorting right after
    #    the tile's real entries; the rest keyed past the tile sentinel)
    #    sort directly into the final padded layout.
    group_band = None
    if bands == 1:
        n_fill = ntiles * chunk
        cap = pairs_cap + n_fill
        pad_counts = jnp.maximum(-(-counts // chunk), 1) * chunk
        pad_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)[:-1]])

        f = jnp.arange(n_fill, dtype=jnp.int32)
        f_tile = f // chunk
        f_active = (f % chunk) < (pad_counts - counts)[f_tile]
        f_keys = jnp.where(f_active, f_tile, ntiles + 1)
        f_packed = (f_keys << id_bits) | t
        parts = [packed, f_packed]
        n_all = packed.shape[0] + n_fill
        if n_all < cap:  # tiny scenes: pad with sentinels so the slice fits
            parts.append(jnp.full((cap - n_all,),
                                  (((ntiles + 1) << id_bits) | t),
                                  jnp.int32))
    else:
        # Two-level banded layout: each (tile, band) bin padded to a glen
        # multiple (groups never span bins, so every glen group has ONE
        # band id), then each tile's bin run padded to a chunk multiple
        # (chunks never span tiles; every tile owns >= 1 chunk). Within a
        # bin, fillers (sentinel id) sort after the real ids; the tile
        # tail is keyed to the tile's LAST bin, so dead groups always
        # follow live groups inside a chunk and the first-slot-is-real
        # liveness arguments below carry over unchanged.
        padded_bin = -(-counts // glen) * glen                 # [nbins]
        tile_sum = padded_bin.reshape(ntiles, bands).sum(axis=1)
        tile_padded = jnp.maximum(-(-tile_sum // chunk), 1) * chunk
        tail = tile_padded - tile_sum                          # [ntiles]
        pad_counts = tile_padded
        pad_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_padded)[:-1]])
        n_fill1 = nbins * glen       # per-bin alignment (< glen per bin)
        n_fill2 = ntiles * chunk     # per-tile tail (< chunk + min-chunk)
        cap = pairs_cap + n_fill1 + n_fill2
        f1 = jnp.arange(n_fill1, dtype=jnp.int32)
        f1_bin = f1 // glen
        f1_active = (f1 % glen) < (padded_bin - counts)[f1_bin]
        f1_keys = jnp.where(f1_active, f1_bin, nbins + 1)
        f2 = jnp.arange(n_fill2, dtype=jnp.int32)
        f2_tile = f2 // chunk
        f2_active = (f2 % chunk) < tail[f2_tile]
        f2_keys = jnp.where(f2_active, f2_tile * bands + (bands - 1),
                            nbins + 1)
        parts = [packed, (f1_keys << id_bits) | t,
                 (f2_keys << id_bits) | t]
    # Chunk-align the layout capacity. n_fill1 = nbins*glen need not be a
    # chunk multiple, and a floor(cap/chunk) grid would TRUNCATE the last
    # partial chunk — in a fully-packed worst case (layout use == cap)
    # that silently drops real records. Pad with global sentinels instead.
    cap_aligned = -(-cap // chunk) * chunk
    n_all = sum(p.shape[0] for p in parts)
    if n_all < cap_aligned:
        parts.append(jnp.full((cap_aligned - n_all,),
                              (((nbins if bands > 1 else ntiles) + 1)
                               << id_bits) | t, jnp.int32))
    cap = cap_aligned
    sorted2 = jnp.sort(jnp.concatenate(parts))[:cap]

    # Decode: real entries map back to their triangle, fillers to -1.
    # Entries beyond a tile's active region (budget tail / sentinel) also
    # decode to -1 via the key check.
    s_id = sorted2 & ((1 << id_bits) - 1)
    s_key = sorted2 >> id_bits
    ids = jnp.where((s_id < t) & (s_key < nbins),
                    s_id, -1).astype(jnp.int32)
    if bands > 1:
        # Band id per glen group, read straight off the group's FIRST
        # slot's sorted key: groups never span bins, per-bin fillers carry
        # their bin's key, tile-tail fillers are keyed to the tile's LAST
        # bin (band bands-1), and global sentinels (key nbins+1, dead
        # groups the lv gate skips) clip to bands-1 — so no layout-width
        # searchsorted (a [nbins + cap/glen] merge-sort) is needed at all.
        gslots = jnp.arange(cap // glen, dtype=jnp.int32) * glen
        group_band = jnp.clip(s_key[gslots], 0, nbins - 1) % bands

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
    # Live = this chunk holds at least one real entry. Real ids sort ahead
    # of fillers/pruned within each tile's segment and chunks never span
    # tiles, so "first slot is real" is exact; dead chunks (padding tails,
    # all-pruned tails, the global tail) skip their whole triangle loop
    # (~40% of slots for typical scenes).
    live_flag = (ids[cc * chunk] >= 0).astype(jnp.int32)
    # Last chunk of each tile's run (the global tail belongs to the last
    # tile, so its last_flag is the final chunk): exactly one per tile —
    # the fused kernel runs its shading epilogue there.
    last_flag = jnp.concatenate(
        [(chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])

    return BinInfo(ids=ids, chunk_tile=chunk_tile, first_flag=first_flag,
                   live_flag=live_flag, last_flag=last_flag,
                   overflow_mask=overflow,
                   n_overflow=jnp.sum(overflow.astype(jnp.int32)),
                   group_band=group_band)


def live_first_permutation(live_flag: jax.Array):
    """Stable live-first chunk permutation: (perm [n] i32, n_live i32).

    perm's first n_live entries are the indices of the live chunks in
    their original (tile-major) order — so consecutive permuted steps
    still revisit the same output tile block (DMA elision holds) — and
    dead chunks follow. Feeding the fused kernel's stream/output index
    maps through ``perm`` with a *dynamic* grid bound of ``n_live``
    removes dead grid steps (empty-tile mandatory chunks, budget tail)
    from the walk entirely: each dead Mosaic step costs ~5 us at 1080p
    (~1.3 ms/frame for 255 empty tiles; docs/PERF.md backlog #1).

    Built from two tiny matmuls (MXU, exact in f32 — counts < 2^24)
    instead of sort/cumsum: a TPU sort has ~1.6 ms fixed cost, a [n]
    cumsum lowers to a log-depth chain of overhead-bound ops; the [n, n]
    one-hot matmuls are < 2 M MACs for any realistic chunk count.
    """
    n = live_flag.shape[0]
    lf = live_flag.astype(jnp.float32)
    idx = jnp.arange(n, dtype=jnp.float32)
    lower = (idx[:, None] >= idx[None, :]).astype(jnp.float32)
    cum = jax.lax.dot(lower, lf,
                      precision=jax.lax.Precision.HIGHEST)  # inclusive
    n_live = cum[n - 1]
    # Stable target position of chunk c: live -> cum-1, dead -> n_live +
    # (dead prefix count) - 1.
    pos = jnp.where(live_flag == 1, cum - 1.0,
                    n_live + (idx + 1.0 - cum) - 1.0)
    onehot = (pos[:, None] == idx[None, :]).astype(jnp.float32)  # [c, j]
    perm = jax.lax.dot(idx, onehot,
                       precision=jax.lax.Precision.HIGHEST)  # [j]
    return perm.astype(jnp.int32), n_live.astype(jnp.int32)


def overflow_id_waves(info: BinInfo, ov_len: int) -> jax.Array:
    """[n_waves * ov_len] overflow triangle ids in ascending order (-1 =
    inert). Call INSIDE an overflow-only branch — contains a sort."""
    t = info.overflow_mask.shape[0]
    n_waves = max(-(-t // ov_len), 1)
    ov_key = jnp.where(info.overflow_mask, jnp.arange(t, dtype=jnp.int32),
                       t)
    ov_sorted = jnp.full((n_waves * ov_len,), t, jnp.int32).at[
        :t].set(jnp.sort(ov_key))
    return jnp.where(ov_sorted < t, ov_sorted, -1)


def packed_keys_fit(t: int, *, width: int, height: int,
                    tile_h: int = TILE_H, tile_w: int = TILE_W,
                    chunk: int = CHUNK, kmax: int = KMAX,
                    bands: int = 1) -> bool:
    """Static check that the packed (bin, id) sort keys fit in int32 for
    this scene size; callers fall back to the unbinned kernel when they
    don't (~2M triangles at 1080p with the default tiles)."""
    gh = -(-height // tile_h)
    gw = -(-width // tile_w)
    nbins = gh * gw * bands
    id_bits = (t + 1).bit_length()
    tile_bits = (nbins + 2).bit_length()
    return id_bits + tile_bits <= 31


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


def _fused_kernel(*all_refs, tile_h, tile_w, chunk, gw, n_channels,
                  n_out, epilogue, seeded=False, sub=1, permuted=False,
                  band_h=None, glen=None):
    """Fused visibility + G-buffer resolve + shading epilogue.

    One pass over the binned stream: each triangle's depth test and
    attribute-plane evaluation happen together (progressive overwrite
    where the candidate wins == the final winner's attributes, exactly the
    split kernels' result), and when a tile's list ends (last_flag) the
    shading epilogue (ops/shading.py fused_epilogue) runs on the VMEM-
    resident accumulators — the whole reference fragment stage
    (Shaders.metal:116-167) plus lighting in a single kernel.

    seeded: overflow-frame variant — (z, id, G-buffer) tiles are
    initialized from a pre-merged overflow pass instead of clear values,
    and the depth test breaks ties by the lex (depth, id) rule so a binned
    triangle beats a seeded one only when drawn earlier (exactly the
    reference's first-wins order; equal to plain `<` when unseeded).

    sub: live-gating granularity — lv_ref holds `sub` flags per grid step
    and the record walk runs as `sub` independently-gated segments. A
    fatter chunk amortizes the ~5 us Mosaic per-step overhead while the
    sub-gates keep dead-slot skipping at the finer granularity.

    permuted: the live-first dynamic-grid variant — an extra leading
    ``perm`` prefetch ref (consumed only by the index maps) plus two
    trailing HBM-space inputs (the XLA-cleared z/id buffers aliased to
    the outputs, never read here: unvisited tiles keep their clear
    values because the alias made the cleared input BE the output).

    band_h/glen: band-partitioned walk — the stream is grouped into
    glen-record groups that each touch ONE [band_h, tile_w] horizontal
    slab of the tile (build_bins(bands=...)); an extra ``bd`` prefetch
    ref (after lv) maps groups to bands. Each record's edge/depth/plane
    math runs on its slab only (tile_h/band_h× less VPU work per
    record); z/id/acc slabs are read and written through dynamic
    8-row-aligned sublane slices. Bit-identical to the full-tile walk:
    every pixel sees the same candidates in the same order.
    """
    banded = band_h is not None and band_h != tile_h
    if permuted and banded:
        (_perm_ref, ct_ref, ff_ref, lv_ref, bd_ref, lf_ref, yoff_ref,
         rec_ref, prm_ref, _z0_any, _id0_any, *refs) = all_refs
    elif permuted:
        (_perm_ref, ct_ref, ff_ref, lv_ref, lf_ref, yoff_ref, rec_ref,
         prm_ref, _z0_any, _id0_any, *refs) = all_refs
    elif banded:
        (ct_ref, ff_ref, lv_ref, bd_ref, lf_ref, yoff_ref, rec_ref,
         prm_ref, *refs) = all_refs
    else:
        (ct_ref, ff_ref, lv_ref, lf_ref, yoff_ref, rec_ref,
         prm_ref, *refs) = all_refs
    if seeded:
        zs_ref, ids_ref, gbs_ref, z_ref, id_ref, out_ref, acc_ref = refs
    else:
        z_ref, id_ref, out_ref, acc_ref = refs
    cc = pl.program_id(0)

    @pl.when(ff_ref[cc] == 1)
    def _init():
        if seeded:
            z_ref[:] = zs_ref[:]
            id_ref[:] = ids_ref[:]
            acc_ref[:] = gbs_ref[:]
        else:
            z_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
            id_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
            acc_ref[:] = jnp.zeros((n_channels, tile_h, tile_w),
                                   jnp.float32)

    def make_body(xs, ys):
        def body(k, carry):
            zbuf, idbuf, acc = carry
            tri = rec_ref[k, 10].astype(jnp.int32)
            e0 = rec_ref[k, 0] * xs + rec_ref[k, 2] * ys + rec_ref[k, 4]
            e1 = rec_ref[k, 1] * xs + rec_ref[k, 3] * ys + rec_ref[k, 5]
            e2 = rec_ref[k, 6] - e0 - e1
            inside = jnp.logical_and(
                jnp.logical_and(e0 >= 0.0, e1 >= 0.0), e2 >= 0.0)
            depth = rec_ref[k, 7] * xs + rec_ref[k, 8] * ys + rec_ref[k, 9]
            cand = jnp.where(inside, depth, jnp.inf)
            better = cand < zbuf  # ascending-id order => first wins ties
            if seeded:
                # Lex (depth, id): a seed can carry a LATER triangle at
                # equal depth; poison entries (tri = -1, cand = +inf)
                # never match uncovered seed pixels (idbuf = -1).
                better = jnp.logical_or(
                    better, jnp.logical_and(cand == zbuf, tri < idbuf))
            acc = tuple(
                jnp.where(better,
                          rec_ref[k, REC_BASE + 3 * a] * xs
                          + rec_ref[k, REC_BASE + 3 * a + 1] * ys
                          + rec_ref[k, REC_BASE + 3 * a + 2],
                          acc[a])
                for a in range(n_channels))
            return (jnp.where(better, cand, zbuf),
                    jnp.where(better, tri, idbuf), acc)

        return body

    if banded:
        # Per-group slab walk. Pixel coords must be bit-equal to the
        # full-tile iota path: (slab iota + row0) is exact in f32 (small
        # ints), so row r's coordinate rounds identically.
        ngroups = chunk // glen
        x0f = ((ct_ref[cc] % gw) * tile_w).astype(jnp.float32)
        y0f = ((ct_ref[cc] // gw) * tile_h + yoff_ref[0]).astype(
            jnp.float32)
        xs_s = (jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 1)
                .astype(jnp.float32) + (x0f + 0.5))
        ys_i = jax.lax.broadcasted_iota(
            jnp.int32, (band_h, tile_w), 0).astype(jnp.float32)
        for s in range(ngroups):
            @pl.when(lv_ref[cc * ngroups + s] == 1)
            def _work(s=s):
                row0 = bd_ref[cc * ngroups + s] * band_h
                ys_s = (ys_i + row0.astype(jnp.float32)) + (y0f + 0.5)
                body = make_body(xs_s, ys_s)
                rs = pl.ds(row0, band_h)
                zbuf, idbuf, acc = jax.lax.fori_loop(
                    s * glen, (s + 1) * glen, body,
                    (z_ref[rs, :], id_ref[rs, :],
                     tuple(acc_ref[a, rs, :] for a in range(n_channels))),
                    unroll=glen)
                z_ref[rs, :] = zbuf
                id_ref[rs, :] = idbuf
                for a in range(n_channels):
                    acc_ref[a, rs, :] = acc[a]
    else:
        body = make_body(
            *_tile_coords(ct_ref[cc], yoff_ref[0], gw, tile_h, tile_w))
        sublen = chunk // sub
        for s in range(sub):
            @pl.when(lv_ref[cc * sub + s] == 1)
            def _work(s=s):
                zbuf, idbuf, acc = jax.lax.fori_loop(
                    s * sublen, (s + 1) * sublen, body,
                    (z_ref[:], id_ref[:],
                     tuple(acc_ref[a] for a in range(n_channels))),
                    unroll=sublen)
                z_ref[:] = zbuf
                id_ref[:] = idbuf
                for a in range(n_channels):
                    acc_ref[a] = acc[a]

    @pl.when(lf_ref[cc] == 1)
    def _epilogue():
        params = [prm_ref[0, i] for i in range(prm_ref.shape[1])]
        planes = [acc_ref[a] for a in range(n_channels)]
        outs = epilogue(planes, id_ref[:] >= 0, params)
        for c in range(n_out):
            out_ref[c] = outs[c]


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _grid_geometry(width, height, tile_h, tile_w):
    pad_h, pad_w = (-height) % tile_h, (-width) % tile_w
    return pad_h, pad_w, (height + pad_h) // tile_h, (width + pad_w) // tile_w


def _ov_len(t: int, chunk: int, overflow_cap: int) -> int:
    """Static per-wave overflow list length (matches build_bins)."""
    return -(-min(overflow_cap, max(t, 1)) // chunk) * chunk


def _overflow_visibility(rec_table_fn, info, depth0, id0, *, width, height,
                         y_start, tile_h, tile_w, chunk, ov_len,
                         interpret):
    """Merge ALL overflow triangles into (depth0, id0) in waves of ov_len.

    Uses the lex (depth, id) rule — the global winner is min over
    (depth, id), which is associative, so wave order cannot change the
    result and it composes exactly with the binned pass's first-wins-ties
    semantics. Call INSIDE an overflow-only branch (contains a sort).

    rec_table_fn: thunk producing the [T_pad, 16] raster records
    (pack_records / frontend.pack_records_planar) — a thunk so the table
    is only materialized inside the overflow-only branch.

    ov_len is the static wave width: callers pick a small wave (one chunk,
    a ~couple-hundred-step merge grid) when few triangles spilled and the
    big overflow_cap wave otherwise, so a frame with a handful of huge
    triangles doesn't pay a full-capacity merge.
    """
    ov_ids = overflow_id_waves(info, ov_len)
    rec_table = rec_table_fn()

    def wave(state):
        k, d, i = state
        ids = jax.lax.dynamic_slice(ov_ids, (k * ov_len,), (ov_len,))
        ov_rec16 = gather_stream(rec_table, ids, _poison_row())
        n_live = jnp.clip(info.n_overflow - k * ov_len, 0, ov_len)
        d, i = visibility_pallas_merge(
            ov_rec16, d, i, width=width, height=height, y_start=y_start,
            n_live=n_live, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
            lex_tie=True, interpret=interpret)
        return k + 1, d, i

    _, d, i = jax.lax.while_loop(
        lambda s: s[0] * ov_len < info.n_overflow, wave,
        (jnp.int32(0), depth0, id0))
    return d, i


def _overflow_gbuffer(info, table, poison, tid_p, gb0, *, width,
                      height, y_start, tile_h, tile_w, chunk, ov_len,
                      interpret):
    """Resolve overflow triangles' attribute planes into gb0 [A, H, W]
    against the winner map tid_p (padded [H+ph, W+pw]). Wave-looped like
    :func:`_overflow_visibility`; call inside an overflow-only branch."""
    a = gb0.shape[0]
    pad_h, pad_w, gh, gw = _grid_geometry(width, height, tile_h, tile_w)
    yoff = jnp.asarray(y_start, jnp.int32).reshape(1)
    ov_ids_all = overflow_id_waves(info, ov_len)

    def wave(state):
        k, gb = state
        ids = jax.lax.dynamic_slice(ov_ids_all, (k * ov_len,), (ov_len,))
        ov_stream = gather_stream(table, ids, poison)
        nov_chunks = ov_stream.shape[0] // chunk
        ntiles = gh * gw
        ct = jnp.repeat(jnp.arange(ntiles, dtype=jnp.int32), nov_chunks)
        ff = jnp.tile((jnp.arange(nov_chunks, dtype=jnp.int32) == 0
                       ).astype(jnp.int32), ntiles)
        cyc = jnp.tile(jnp.arange(nov_chunks, dtype=jnp.int32), ntiles)
        n_live = jnp.clip(info.n_overflow - k * ov_len, 0, ov_len)
        lv = (cyc * chunk < n_live).astype(jnp.int32)
        gb_p = jnp.pad(gb, ((0, 0), (0, pad_h), (0, pad_w)))
        merge_kernel = functools.partial(
            _resolve_merge_kernel, tile_h=tile_h, tile_w=tile_w,
            chunk=chunk, gw=gw, n_channels=a)
        grid_spec_m = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # ct, ff, cyc, lv, y_offset
            grid=(ntiles * nov_chunks,),
            in_specs=[
                pl.BlockSpec((chunk, table.shape[-1]),
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
        return k + 1, out[:, :height, :width]

    _, gb = jax.lax.while_loop(
        lambda s: s[0] * ov_len < info.n_overflow, wave,
        (jnp.int32(0), gb0))
    return gb


def binned_pipeline(setup: TriangleSetup, attrs=None, *, width: int,
                    height: int, y_start=0, tile_h: int = TILE_H,
                    tile_w: int = TILE_W, chunk: int = CHUNK,
                    kmax: int = KMAX, overflow_cap: int = OVERFLOW_CAP,
                    pair_budget_factor: float = PAIR_BUDGET_FACTOR,
                    prune: bool = False,
                    interpret: bool | None = None):
    """Full binned raster path.

    attrs: optional [T, 3, A] per-vertex attribute values to interpolate.
    Returns (depth [H, W], tri_id [H, W], gbuffer [H, W, A] or None).
    """
    if interpret is None:
        interpret = default_interpret()
    chunk = effective_chunk(chunk, interpret)
    if not packed_keys_fit(setup.num_triangles, width=width, height=height,
                           tile_h=tile_h, tile_w=tile_w, chunk=chunk,
                           kmax=kmax):
        # Graceful static fallback instead of the packed-key assert: the
        # unbinned kernel + XLA gather resolve handle any scene size.
        from .rasterize_pallas import visibility_pallas
        from .resolve import barycentrics_at_pixels, interpolate_attribute
        depth, tri_id = visibility_pallas(
            setup, width=width, height=height, y_start=y_start,
            tile_h=tile_h, tile_w=tile_w, chunk=chunk, interpret=interpret)
        if attrs is None:
            return depth, tri_id, None
        ws, covered = barycentrics_at_pixels(setup, tri_id, y_start)
        return depth, tri_id, interpolate_attribute(attrs, tri_id, ws,
                                                    covered)
    info = build_bins(setup, width=width, height=height, y_start=y_start,
                      tile_h=tile_h, tile_w=tile_w, chunk=chunk, kmax=kmax,
                      overflow_cap=overflow_cap,
                      pair_budget_factor=pair_budget_factor, prune=prune)
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
    # Processed in waves inside an overflow-only branch, so ANY overflow
    # volume renders correctly (nothing is dropped past a cap) and
    # spill-free frames pay nothing — not even the id compaction sort.
    # A small spill (<= one chunk) takes a one-chunk wave: a few spilled
    # triangles cost a ~ntiles-step merge, not a full-capacity one.
    big_ov = _ov_len(setup.num_triangles, chunk, overflow_cap)

    def ov_vis(args, ov_len):
        return _overflow_visibility(
            functools.partial(pack_records, setup, chunk), info, *args,
            width=width, height=height, y_start=y_start, tile_h=tile_h,
            tile_w=tile_w, chunk=chunk, ov_len=ov_len, interpret=interpret)

    if big_ov > chunk:
        merge_vis = lambda args: jax.lax.cond(
            info.n_overflow <= chunk,
            lambda a: ov_vis(a, chunk),
            lambda a: ov_vis(a, big_ov), args)
    else:
        merge_vis = lambda args: ov_vis(args, big_ov)
    depth_s, tri_id_s = jax.lax.cond(
        info.n_overflow > 0, merge_vis, lambda args: args,
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

    # --- overflow resolve (rare; same wave scheme as the visibility merge) --
    def ov_gb(g, ov_len):
        return _overflow_gbuffer(
            info, table, poison, tid_p, g, width=width,
            height=height, y_start=y_start, tile_h=tile_h, tile_w=tile_w,
            chunk=chunk, ov_len=ov_len, interpret=interpret)

    if big_ov > chunk:
        merge_gb = lambda g: jax.lax.cond(
            info.n_overflow <= chunk,
            lambda a: ov_gb(a, chunk), lambda a: ov_gb(a, big_ov), g)
    else:
        merge_gb = lambda g: ov_gb(g, big_ov)
    gb = jax.lax.cond(info.n_overflow > 0, merge_gb, lambda g: g, gb)
    return depth_s, tri_id_s, jnp.moveaxis(gb, 0, -1)


# Fused-kernel chunking. Swept on v5e at 1080p/100k (budget 0.75):
# chunk 128/sub 1 = 14.1 ms kernel stage; 256/sub 2 = 14.9 (fatter steps
# cut the grid 841 -> 547 but the larger per-step SMEM DMA and the
# ntiles*chunk fill growth eat the win); 192 and 256 without sub-gating
# were worse still. The sub mechanism stays for future sweeps.
FUSED_CHUNK = CHUNK
FUSED_SUB = 1
# Band partitioning (build_bins(bands=...)): tile_h/bands-row slabs per
# record walk. Swept on v5e at 1080p/100k (docs/PERF.md round 3 step 15):
# bands 4 / glen 16 = 16.97 ms fused-stage vs 19.51 full-tile control
# (budget 0.85 vs 0.75); bands 8 loses (pair growth + per-record SMEM
# scalar fetches stop amortizing), glen 8/32 and chunk 256 all lose.
FUSED_BANDS = 4
FUSED_GLEN = 16
# Below this triangle count the banded fill overhead outweighs the slab
# walk (config1's 12-triangle cube measured 13% slower banded).
FUSED_BANDS_MIN_T = 2048


def fused_pipeline(setup: TriangleSetup, attrs, params, *, width: int,
                   height: int, epilogue, n_out: int, y_start=0,
                   tile_h: int = TILE_H, tile_w: int = TILE_W,
                   chunk: int | None = None, kmax: int | None = None,
                   overflow_cap: int = OVERFLOW_CAP,
                   pair_budget_factor: float = PAIR_BUDGET_FACTOR,
                   prune: bool = False, sub: int | None = None,
                   bands: int | None = None, glen: int | None = None,
                   permute: bool = True,
                   interpret: bool | None = None):
    """Binned raster with fused shading: ONE kernel pass computes
    visibility, attribute planes, and the shading epilogue per tile.

    attrs: [T, 3, A] per-vertex attribute values (A >= 1).
    params: f32[PARAMS_WIDTH] shading constants (ops/shading.py).
    epilogue: (planes list[A of 2D], covered 2D, params) -> list[n_out 2D]
      — elementwise jnp only; runs inside the kernel on VMEM tiles.

    Returns (depth [H, W], tri_id [H, W], out [n_out, H, W]).

    Overflow scenes (triangles spanning > kmax tiles or past the pair
    budget) stay on the fused kernel: the spilled triangles are pre-merged
    into full-frame (z, id, G-buffer) seed buffers by the wave kernels and
    the fused pass initializes its tiles from them (lex (depth, id) tie
    rule — first-drawn wins, order-independent), so a frame with a few
    huge triangles costs the fused pass plus one cheap merge wave instead
    of falling off a cliff. Scenes whose packed binning keys don't fit
    int32 route statically to the unbinned kernel + XLA resolve.
    """
    if interpret is None:
        interpret = default_interpret()
    if chunk is None:
        chunk = FUSED_CHUNK
    if sub is None:
        sub = FUSED_SUB
    if bands is None:
        bands = FUSED_BANDS
        if setup.num_triangles < FUSED_BANDS_MIN_T:
            # Tiny scenes: the per-(tile, band) glen fill dominates the
            # slab-walk saving (config1 measured 0.86 -> 0.97 ms/frame
            # banded); the full-tile walk is already sub-millisecond.
            bands = 1
    if bands > 1 and (tile_h % bands or (tile_h // bands) % 8):
        bands = 1  # tile too short to split into 8-row-aligned slabs
    if glen is None:
        glen = FUSED_GLEN
    if kmax is None:
        # kmax gates spill per (tile, band) PAIR; band spans are bands×
        # taller in band units, so scale the default to keep the same
        # pixel-height spill threshold. Cheap: the compact emission never
        # materializes [T, kmax] arrays.
        kmax = KMAX * bands
    chunk = effective_chunk(chunk, interpret)
    glen = min(glen, chunk)
    banded = bands > 1
    if banded:
        sub = chunk // glen  # one live gate per band group
    else:
        sub = min(sub, max(chunk // 32, 1))  # keep segments >= 32 records
        while chunk % sub:  # round non-divisor subs down to a divisor
            sub -= 1
    # Polymorphic over the front-end layout: an array TriangleSetup with
    # [T, 3, A] attrs, or the planar front-end (ops/frontend.py) with
    # attrs = list over A of per-corner (v1, v2, v3) [T] column triplets.
    from . import frontend as fe
    planar = isinstance(setup, fe.PlanarSetup)
    a = len(attrs) if planar else attrs.shape[-1]
    t = setup.num_triangles
    prm = jnp.asarray(params, jnp.float32).reshape(1, -1)

    def xla_epilogue(tri_id, gb_hwa):
        covered = tri_id != -1
        planes = [gb_hwa[..., i] for i in range(a)]
        outs = epilogue(planes, covered, params)
        return jnp.stack(outs, axis=0)

    if not packed_keys_fit(t, width=width, height=height, tile_h=tile_h,
                           tile_w=tile_w, chunk=chunk, kmax=kmax,
                           bands=bands):
        # Static fallback: unbinned visibility + XLA gather resolve.
        from .rasterize_pallas import visibility_pallas
        from .resolve import barycentrics_at_pixels, interpolate_attribute
        if planar:
            setup = fe.to_setup(setup)
            attrs = jnp.stack([jnp.stack(v, axis=-2) for v in attrs],
                              axis=-1)  # -> [T, 3, A]
        depth, tri_id = visibility_pallas(
            setup, width=width, height=height, y_start=y_start,
            tile_h=tile_h, tile_w=tile_w, chunk=chunk, interpret=interpret)
        ws, covered = barycentrics_at_pixels(setup, tri_id, y_start)
        gb = interpolate_attribute(attrs, tri_id, ws, covered)
        return depth, tri_id, xla_epilogue(tri_id, gb)

    info = build_bins(setup, width=width, height=height, y_start=y_start,
                      tile_h=tile_h, tile_w=tile_w, chunk=chunk, kmax=kmax,
                      overflow_cap=overflow_cap,
                      pair_budget_factor=pair_budget_factor, prune=prune,
                      bands=bands, glen=glen)
    if planar:
        table, _, poison = fe.stream_table_planar(
            setup, fe.attribute_plane_cols(setup, attrs))
        rec_fn = functools.partial(fe.pack_records_planar, setup, chunk)
    else:
        table, _, poison = build_stream_table(setup, attrs)
        rec_fn = functools.partial(pack_records, setup, chunk)
    stream = gather_stream(table, info.ids, poison)
    wtot = table.shape[-1]
    pad_h, pad_w, gh, gw = _grid_geometry(width, height, tile_h, tile_w)
    n_chunks = stream.shape[0] // chunk
    yoff = jnp.asarray(y_start, jnp.int32).reshape(1)
    tile_idx = lambda cc, ct, *rest: (ct[cc] // gw, ct[cc] % gw)
    # Sub-chunk live flags (build_bins' live_flag is per layout chunk;
    # the kernel gates each chunk//sub segment independently — same
    # first-slot-is-real argument, sub-chunks never span tiles).
    lv_sub = (info.ids[:: chunk // sub] >= 0).astype(jnp.int32)

    out_shapes = (
        jax.ShapeDtypeStruct((height + pad_h, width + pad_w), jnp.float32),
        jax.ShapeDtypeStruct((height + pad_h, width + pad_w), jnp.int32),
        jax.ShapeDtypeStruct((n_out, height + pad_h, width + pad_w),
                             jnp.float32),
    )

    def run_fused_permuted(_):
        """Spill-free fast path: walk ONLY the live chunks.

        The stream/output index maps are routed through a stable
        live-first chunk permutation and the grid bound is the *dynamic*
        live-chunk count, so dead grid steps (empty-tile mandatory
        chunks, padding tails, the static budget tail — each ~5 us of
        pure Mosaic step overhead) never run at all. Output tiles the
        walk never visits keep their clear values because the XLA-cleared
        z/id buffers are input_output_aliased INTO the outputs (they are
        the same buffer); the [n_out, H, W] epilogue output is left
        unaliased — unvisited regions hold garbage, which is safe because
        every consumer masks it with ``tri_id != -1`` (finish_fused) and
        tri_id there is -1 by the alias.

        (A permuted live-prefix TIERED stream gather — only live chunks'
        rows materialized, texture-style cap tiers on the live-chunk
        count — measured perf-NEUTRAL here and tripled the fused-path
        compile variants, so the gather stays full-layout; see
        docs/PERF.md round 3.)
        """
        perm, n_live = live_first_permutation(info.live_flag)
        ct_p = info.chunk_tile[perm]
        jj = jnp.arange(n_chunks, dtype=jnp.int32)
        ff_p = ((jj == 0) | (ct_p != jnp.roll(ct_p, 1))).astype(jnp.int32)
        lf_p = ((jj == n_live - 1)
                | (ct_p != jnp.roll(ct_p, -1))).astype(jnp.int32)
        gexp = (perm[:, None] * sub
                + jnp.arange(sub, dtype=jnp.int32)[None, :]).reshape(-1)
        lv_p = lv_sub[gexp]
        kernel = functools.partial(
            _fused_kernel, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
            gw=gw, n_channels=a, n_out=n_out, epilogue=epilogue,
            seeded=False, sub=sub, permuted=True,
            band_h=tile_h // bands if banded else None,
            glen=glen if banded else None)
        tile_idx_p = (lambda j, pm, ct, *rest:
                      (ct[j] // gw, ct[j] % gw))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            # perm, ct, ff, lv, [bd,] lf, y_off
            num_scalar_prefetch=7 if banded else 6,
            grid=(n_live,),
            in_specs=[
                pl.BlockSpec((chunk, wtot),
                             lambda j, pm, *rest: (pm[j], 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, prm.shape[1]),
                             lambda j, *rest: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # aliased z clear
                pl.BlockSpec(memory_space=pl.ANY),  # aliased id clear
            ],
            out_specs=(
                pl.BlockSpec((tile_h, tile_w), tile_idx_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_h, tile_w), tile_idx_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (n_out, tile_h, tile_w),
                    lambda j, pm, ct, *rest:
                    (0, ct[j] // gw, ct[j] % gw),
                    memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((a, tile_h, tile_w), jnp.float32)],
        )
        z0 = jnp.full((height + pad_h, width + pad_w), jnp.inf,
                      jnp.float32)
        id0 = jnp.full((height + pad_h, width + pad_w), -1, jnp.int32)
        pf = [perm, ct_p, ff_p, lv_p]
        if banded:
            pf.append(info.group_band[gexp])
        pf += [lf_p, yoff]
        npf = len(pf)
        depth, tri_id, out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            # Inputs count scalar-prefetch args: npf prefetch + stream +
            # prm + z0 + id0; outputs (depth, id, out).
            input_output_aliases={npf + 2: 0, npf + 3: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*pf, stream, prm, z0, id0)
        return (depth[:height, :width], tri_id[:height, :width],
                out[:, :height, :width])

    def run_fused(seeds):
        """One fused-kernel pass; seeds = (z, id, gb) padded arrays or
        None for the clear-initialized fast variant."""
        seeded = seeds is not None
        kernel = functools.partial(
            _fused_kernel, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
            gw=gw, n_channels=a, n_out=n_out, epilogue=epilogue,
            seeded=seeded, sub=sub,
            band_h=tile_h // bands if banded else None,
            glen=glen if banded else None)
        in_specs = [
            pl.BlockSpec((chunk, wtot),
                         lambda cc, *rest: (cc, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, prm.shape[1]),
                         lambda cc, *rest: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args = [stream, prm]
        if seeded:
            in_specs += [
                pl.BlockSpec((tile_h, tile_w), tile_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_h, tile_w), tile_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (a, tile_h, tile_w),
                    lambda cc, ct, *rest:
                    (0, ct[cc] // gw, ct[cc] % gw),
                    memory_space=pltpu.VMEM),
            ]
            args += list(seeds)
        pf = [info.chunk_tile, info.first_flag, lv_sub]
        if banded:
            pf.append(info.group_band)
        pf += [info.last_flag, yoff]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            # ct, ff, lv, [bd,] lf, y_off
            num_scalar_prefetch=len(pf),
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((tile_h, tile_w), tile_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_h, tile_w), tile_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (n_out, tile_h, tile_w),
                    lambda cc, ct, *rest:
                    (0, ct[cc] // gw, ct[cc] % gw),
                    memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((a, tile_h, tile_w), jnp.float32)],
        )
        depth, tri_id, out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*pf, *args)
        return (depth[:height, :width], tri_id[:height, :width],
                out[:, :height, :width])

    # permute=False is a measurement knob (docs/PERF.md backlog #1):
    # the static grid walks every chunk, dead ones included.
    fast = run_fused_permuted if permute else (lambda _: run_fused(None))

    def slow_with(ov_len):
        # Overflow present (triangles spanning > kmax tiles or past the
        # pair budget): pre-merge ALL of them into full-frame (z, id,
        # G-buffer) seeds with the wave kernels, then run the SAME fused
        # kernel seeded from those buffers (lex (depth, id) ties keep the
        # reference's first-wins order). The binned majority still renders
        # at fused-kernel speed — no cliff, nothing dropped at any spill
        # size.
        def slow(_):
            z0 = jnp.full((height, width), jnp.inf, jnp.float32)
            i0 = jnp.full((height, width), -1, jnp.int32)
            z_ov, id_ov = _overflow_visibility(
                rec_fn, info, z0, i0, width=width, height=height,
                y_start=y_start, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
                ov_len=ov_len, interpret=interpret)
            tid_p = jnp.pad(id_ov, ((0, pad_h), (0, pad_w)),
                            constant_values=-1) if (pad_h or pad_w) else id_ov
            gb_ov = _overflow_gbuffer(
                info, table, poison, tid_p,
                jnp.zeros((a, height, width), jnp.float32), width=width,
                height=height, y_start=y_start, tile_h=tile_h,
                tile_w=tile_w, chunk=chunk, ov_len=ov_len,
                interpret=interpret)
            z_p = jnp.pad(z_ov, ((0, pad_h), (0, pad_w)),
                          constant_values=jnp.inf)
            gb_p = jnp.pad(gb_ov, ((0, 0), (0, pad_h), (0, pad_w)))
            return run_fused((z_p, tid_p, gb_p))
        return slow

    big_ov = _ov_len(t, chunk, overflow_cap)
    if big_ov > chunk:
        # Small spills (<= one chunk — a few huge triangles) take a
        # one-chunk wave; only mass spills pay the full-capacity waves.
        slow = lambda _: jax.lax.cond(
            info.n_overflow <= chunk, slow_with(chunk),
            slow_with(big_ov), None)
    else:
        slow = slow_with(big_ov)
    depth, tri_id, out = jax.lax.cond(info.n_overflow == 0, fast, slow,
                                      None)
    # The fast path leaves `out` UNWRITTEN (hardware garbage) on tiles the
    # live-only walk never visits; tri_id there is -1 by the alias, so one
    # covered-mask select (fused into the XLA tail by the compiler) makes
    # the returned G-buffer deterministic everywhere.
    out = jnp.where(tri_id[None, :, :] != -1, out, 0.0)
    return depth, tri_id, out


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "tile_h", "tile_w",
                                    "chunk", "kmax", "overflow_cap",
                                    "pair_budget_factor", "prune",
                                    "interpret"))
def visibility_binned(setup: TriangleSetup, *, width: int, height: int,
                      y_start=0, tile_h: int = TILE_H, tile_w: int = TILE_W,
                      chunk: int = CHUNK, kmax: int = KMAX,
                      overflow_cap: int = OVERFLOW_CAP,
                      pair_budget_factor: float = PAIR_BUDGET_FACTOR,
                      prune: bool = False,
                      interpret: bool | None = None):
    """Binned visibility pass. Same contract as visibility_ref /
    visibility_pallas (golden-tested equal); scales to 100k+ triangles."""
    depth, tri_id, _ = binned_pipeline(
        setup, None, width=width, height=height, y_start=y_start,
        tile_h=tile_h, tile_w=tile_w, chunk=chunk, kmax=kmax,
        overflow_cap=overflow_cap, pair_budget_factor=pair_budget_factor,
        prune=prune, interpret=interpret)
    return depth, tri_id
