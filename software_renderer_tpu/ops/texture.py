"""Texture sampling: nearest and bilinear, clamp/repeat addressing.

The reference loads UVs from its mesh but never samples a texture
(App.swift:129-133 — SURVEY.md component 17 notes UVs are dropped); texture
support is part of the driver-assigned north star (BASELINE.json configs
2/4). Implemented as batched gathers over the whole frame — XLA lowers
these to vectorized dynamic-gathers that fuse with the resolve pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _effective_pack(pack: int, th: int, tw: int) -> int:
    """The packing the table builders can actually honor for this shape
    (packs need even/4-divisible texture dims); 1 is always valid."""
    if pack == 16 and th % 4 == 0 and tw % 4 == 0:
        return 16
    if pack == 2 and tw % 2 == 0:
        return 2
    if pack == 4 and th % 2 == 0 and tw % 2 == 0:
        return 4
    return 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Texture:
    """An RGB(A) texture. data: [Th, Tw, C] float32 in [0, 1].

    table_dtype: storage dtype of the bilinear quad table. float32 is the
    measured optimum on v5e: the 2M-row frame gather is row-issue-bound
    with 2D indices (~7 ms at 1080p), and a float16 table LOSES ~2.8 ms —
    the narrow-minor [H, W, 12] f16->f32 conversion after the gather is a
    padded relayout that costs more than the halved row bytes save.

    table / table_pack: the precomputed bilinear gather table, an
    EXPLICIT pytree leaf built once at construction for concrete data
    (replacing round 4's hidden module-global id-keyed cache — the
    table's lifetime is now the texture's own). Table construction is a
    chain of rolls + concat + strided slice: when the texture reaches
    the sampler as a jit CLOSURE constant (the steady-state render loop
    — bench.py closes over the RenderPass and scans frames), those ops
    would land INSIDE the traced frame body, XLA refuses to
    constant-fold them at this size, and the table would be rebuilt
    every frame (~2.3 ms/frame for pack 16, tools/measure_pack16.py
    const-table A/B). TRACED data (training w.r.t. texture) leaves
    ``table=None`` and the samplers build in-graph so gradients flow.
    table_pack records which :data:`TEX_TABLE_PACK` layout ``table``
    holds (0 = none); samplers needing a different pack build in-graph.
    ``dataclasses.replace(tex, data=...)`` must also pass ``table=None``
    (the copied table would describe the old texels); construct a fresh
    ``Texture(data=...)`` instead.
    """

    data: jax.Array
    # "nearest" | "bilinear" | "trilinear" (mipmapped — an extension past
    # the reference's feature set; see the mipmap section below).
    filter: str = dataclasses.field(default="bilinear",
                                    metadata=dict(static=True))
    wrap: str = dataclasses.field(default="repeat",
                                  metadata=dict(static=True))
    table_dtype: str = dataclasses.field(default="float32",
                                         metadata=dict(static=True))
    table: jax.Array | None = None
    table_pack: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))

    def __post_init__(self):
        # Runs at construction AND at every pytree unflatten (jit/vmap
        # boundaries reconstruct via the constructor): only the first
        # concrete construction builds — unflattened copies carry the
        # table through, traced data skips.
        if (self.table is None and self.filter == "bilinear"
                and not isinstance(self.data, jax.core.Tracer)):
            th, tw = self.data.shape[0], self.data.shape[1]
            pack = _effective_pack(TEX_TABLE_PACK, th, tw)
            with jax.ensure_compile_time_eval():
                self.table = (_quad_table_build(self) if pack == 1 else
                              _packed_quad_table_build(self, pack))
            self.table_pack = pack
        elif (self.table is None and self.filter == "trilinear"
                and not isinstance(self.data, jax.core.Tracer)):
            # The packed mip pyramid (level-0 quad table first — a
            # strict superset of the bilinear pack-1 table, see the
            # mipmap section). Packs don't apply to the pyramid.
            with jax.ensure_compile_time_eval():
                self.table = _mip_table_build(self)
            self.table_pack = 1


def _wrap_coords(i, n, mode):
    if mode == "repeat":
        return jnp.mod(i, n)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown wrap mode {mode!r}")


def _quad_table(tex: Texture):
    """[Th*Tw, 4C] table where row (y, x) holds the 2x2 texel neighborhood
    [t(y,x), t(y,x+1), t(y+1,x), t(y+1,x+1)] with the wrap mode baked in.

    Bilinear sampling then needs ONE row gather per pixel instead of four
    scattered texel gathers — a 4x reduction in gather count, which is
    what TPU gather throughput is proportional to. Served from the
    texture's precomputed ``table`` leaf when it holds the pack-1
    layout; built in-graph otherwise (traced data, or a pack mismatch
    after flipping :data:`TEX_TABLE_PACK` post-construction).
    """
    if tex.table is not None and tex.table_pack == 1:
        return tex.table
    return _quad_table_build(tex)


def _quad_table_build(tex: Texture):
    return _quad_table_from(tex.data, tex.wrap, tex.table_dtype)


def _quad_table_from(d, wrap: str, table_dtype):
    if wrap == "repeat":
        dx = jnp.roll(d, -1, axis=1)
        dy = jnp.roll(d, -1, axis=0)
        dxy = jnp.roll(dx, -1, axis=0)
    else:  # clamp: shift with edge duplication
        dx = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
        dy = jnp.concatenate([d[1:], d[-1:]], axis=0)
        dxy = jnp.concatenate([dx[1:], dx[-1:]], axis=0)
    th, tw, c = d.shape
    quad = jnp.concatenate([d, dx, dy, dxy], axis=-1)  # [Th, Tw, 4C]
    return quad.reshape(th * tw, 4 * c).astype(table_dtype)


def sample_texture_planes(tex: Texture, u, v):
    """Planar bilinear sample: u, v are separate [...] arrays; returns a
    list of C [...] planes.

    Identical math to :func:`sample_texture`, but every intermediate is a
    full-lane-width 2D array — no [..., 2]/[..., 4C] narrow-minor-dim
    tensors, which on TPU tile the last dimension up to 128 lanes and turn
    each elementwise op into a padded relayout. The quad gather stays one
    row gather per pixel.
    """
    th, tw = tex.data.shape[0], tex.data.shape[1]
    c = tex.data.shape[2]
    if tex.filter == "trilinear":
        return sample_texture_planes_trilinear(tex, u, v)
    u = u * tw
    v = v * th
    if tex.filter == "nearest":
        xi = _wrap_coords(jnp.floor(u).astype(jnp.int32), tw, tex.wrap)
        yi = _wrap_coords(jnp.floor(v).astype(jnp.int32), th, tex.wrap)
        flat = tex.data.reshape(th * tw, c)
        texel = flat[yi * tw + xi]  # [..., C]
        return [texel[..., i] for i in range(c)]
    if tex.filter != "bilinear":
        raise ValueError(f"unknown filter {tex.filter!r}")
    x = u - 0.5
    y = v - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xa = _wrap_coords(x0.astype(jnp.int32), tw, tex.wrap)
    ya = _wrap_coords(y0.astype(jnp.int32), th, tex.wrap)
    # One row gather per pixel either way; the pack-16 supertile table
    # (4096 rows at 256^2) crosses the gather's table-size threshold and
    # is bit-identical after the select tree (see TEX_TABLE_PACK).
    pack16 = TEX_TABLE_PACK == 16 and tw % 4 == 0 and th % 4 == 0
    if pack16:
        st = _packed_quad_table(tex, 16)
        quad = st[(ya >> 2) * (tw // 4) + (xa >> 2)].astype(jnp.float32)
        px, py = xa & 3, ya & 3
    else:
        quad = _quad_table(tex)[ya * tw + xa].astype(jnp.float32)
    out = []
    for i in range(c):
        if pack16:
            t00, t01, t10, t11 = _supertile_corners(quad, px, py, c, i)
        else:
            t00 = quad[..., i]
            t01 = quad[..., c + i]
            t10 = quad[..., 2 * c + i]
            t11 = quad[..., 3 * c + i]
        top = t00 + (t01 - t00) * fx
        bot = t10 + (t11 - t10) * fx
        out.append(top + (bot - top) * fy)
    return out


# ---------------------------------------------------------------------------
# Mipmapped (trilinear) filtering — an opt-in extension past the
# reference (which has no texturing at all; UVs are loaded then dropped,
# App.swift:129-133) and past the north star's bilinear. TPU-shaped the
# same way as bilinear: the WHOLE mip pyramid is one packed pack-1 quad
# table (level 0 first, so rows [0, Th*Tw) are exactly the bilinear
# table and pack-1 consumers can use it unchanged); a trilinear sample
# is TWO row gathers (floor/ceil level) + lerps, with the per-pixel
# level folded into the row index — no per-level branching, static
# shapes throughout.
# ---------------------------------------------------------------------------

def _num_mip_levels(th: int, tw: int) -> int:
    """Levels in the chain: level 0 plus one per 2x box step while both
    dims stay even (non-power-of-two textures stop early; odd-dim
    textures have 1 level and trilinear degenerates to bilinear)."""
    n = 1
    while th % 2 == 0 and tw % 2 == 0 and min(th, tw) > 1:
        th //= 2
        tw //= 2
        n += 1
    return n


def _mip_offsets(th: int, tw: int, n: int):
    """Static row offset of each level's quad table in the packed pyramid."""
    offs = [0]
    for lev in range(1, n):
        offs.append(offs[-1] + (th >> (lev - 1)) * (tw >> (lev - 1)))
    return offs


def _mip_chain(data):
    """[level0=data, level1, ...] by exact 2x2 box averaging (the
    canonical mip construction). Differentiable — texture training
    through a trilinear sampler spreads gradients across the pyramid."""
    levels = [data]
    d = data
    while (d.shape[0] % 2 == 0 and d.shape[1] % 2 == 0
           and min(d.shape[0], d.shape[1]) > 1):
        d = 0.25 * (d[0::2, 0::2] + d[1::2, 0::2]
                    + d[0::2, 1::2] + d[1::2, 1::2])
        levels.append(d)
    return levels


def _mip_table_build(tex: Texture):
    return jnp.concatenate(
        [_quad_table_from(d, tex.wrap, tex.table_dtype)
         for d in _mip_chain(tex.data)], axis=0)


def _mip_table(tex: Texture):
    th, tw = tex.data.shape[0], tex.data.shape[1]
    n = _num_mip_levels(th, tw)
    rows = _mip_offsets(th, tw, n)[-1] + (th >> (n - 1)) * (tw >> (n - 1))
    if (tex.table is not None and tex.table_pack == 1
            and tex.table.shape[0] == rows):
        return tex.table
    return _mip_table_build(tex)


def _lod_rho2(u, v, th: int, tw: int):
    """Squared max texel-space footprint per pixel (pure elementwise —
    the transcendental ``log2`` is the caller's, so the compacted route
    can defer it to compacted space)."""
    def fdiff(a, axis):
        d = jnp.diff(a, axis=axis)
        edge = d[:, -1:] if axis == 1 else d[-1:, :]
        return jnp.concatenate([d, edge], axis=axis)

    rx2 = (fdiff(u, 1) * tw) ** 2 + (fdiff(v, 1) * th) ** 2
    ry2 = (fdiff(u, 0) * tw) ** 2 + (fdiff(v, 0) * th) ** 2
    return jnp.maximum(jnp.maximum(rx2, ry2), 2.0 ** -64)


def screen_lod(u, v, th: int, tw: int):
    """Per-pixel mip level from screen-space finite differences of the
    [H, W] uv planes — the quad-derivative LOD every GPU rasterizer
    uses, computed as forward differences with edge replication. Returns
    log2 of the max texel-space footprint (unclamped; the sampler
    clamps). Caveats shared with hardware ddx/ddy: differences straddle
    triangle boundaries, and value-wrapping UVs (repeat seams where u
    jumps 1->0) read as huge footprints at the seam column."""
    return 0.5 * jnp.log2(_lod_rho2(u, v, th, tw))


def _tri_level_sample(table, offs, tex_c: int, th: int, tw: int, wrap: str,
                      u, v, lev, split: int = 1):
    """Bilinear sample of mip level ``lev`` (per-pixel int32) from the
    packed pyramid ``table``: one row gather with the level folded into
    the row index. Returns C channel arrays shaped like u. ``split``
    partitions the gather's leading axis into independent issues
    (bit-equal — see TEX_GATHER_SPLIT)."""
    tw_l = jnp.right_shift(tw, lev)
    th_l = jnp.right_shift(th, lev)
    x = u * tw_l.astype(jnp.float32) - 0.5
    y = v * th_l.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    if wrap == "repeat":
        xa = jnp.mod(xi, tw_l)
        ya = jnp.mod(yi, th_l)
    else:
        xa = jnp.clip(xi, 0, tw_l - 1)
        ya = jnp.clip(yi, 0, th_l - 1)
    ci = offs[lev] + ya * tw_l + xa
    lead = ci.shape[0]
    if split > 1 and lead % split == 0:
        quad = jnp.concatenate(
            [table[ci[j * (lead // split):(j + 1) * (lead // split)]]
             for j in range(split)], axis=0).astype(jnp.float32)
    else:
        quad = table[ci].astype(jnp.float32)
    out = []
    for i in range(tex_c):
        t00 = quad[..., i]
        t01 = quad[..., tex_c + i]
        t10 = quad[..., 2 * tex_c + i]
        t11 = quad[..., 3 * tex_c + i]
        top = t00 + (t01 - t00) * fx
        bot = t10 + (t11 - t10) * fx
        out.append(top + (bot - top) * fy)
    return out


def sample_texture_planes_trilinear(tex: Texture, u, v, lod=None):
    """Trilinear sample of the [H, W] uv planes; returns C [H, W] planes.

    lod: optional explicit per-pixel mip level (any shape broadcastable
    to u); default derives :func:`screen_lod` from the planes. At an
    exactly-integer lod k the result is bit-equal to bilinear-sampling
    mip level k directly (the level-blend lerp is ``a + (b-a)*0``).
    """
    th, tw, c = tex.data.shape
    n = _num_mip_levels(th, tw)
    if lod is None:
        lod = screen_lod(u, v, th, tw)
    lod = jnp.clip(jnp.broadcast_to(lod, u.shape), 0.0, float(n - 1))
    l0 = jnp.floor(lod).astype(jnp.int32)
    lf = lod - l0.astype(jnp.float32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    table = _mip_table(tex)
    offs = jnp.asarray(_mip_offsets(th, tw, n), jnp.int32)
    lo = _tri_level_sample(table, offs, c, th, tw, tex.wrap, u, v, l0)
    hi = _tri_level_sample(table, offs, c, th, tw, tex.wrap, u, v, l1)
    return [a + (b - a) * lf for a, b in zip(lo, hi)]


# Width of the row segments the compacted sampler works on. 128 keeps
# every compacted intermediate at the full f32 lane width (one native
# tile per segment) and makes segment extraction a pure reshape.
COMPACT_SEG = 128

# Scene-agnostic tier ladder for the compacted sampler, pinned by three
# HARDWARE-measured constants (tools/measure_tex_wrapper.py, PERF.md
# step 16) rather than any scene's coverage histogram:
#   * the compacted path costs fixed + slope*cap (~1.5 ms + ~10.2 ms per
#     unit cap at 1080p on v5e) while the full-frame fallback is ~8.4 ms
#     and FREE to fall into, so caps above the ~0.65-0.70 crossover can
#     never win -> top rung 0.64;
#   * every rung is one more compiled gather variant, so the ladder is
#     geometric with ratio sqrt(2): whatever a frame's live coverage,
#     the engaged rung's STATIC cap (the thing the gather actually pays,
#     not the live count) is within sqrt(2)x of ideal, with only
#     log_sqrt2(top/floor) rungs of compile cost;
#   * below cap ~0.2 the fixed compaction cost dominates the gather line
#     (0.2 * 10.2 ~= 2 ms vs ~1.5 ms fixed) — halving the cap saves
#     under 1 ms, not worth another compile unit -> 4 rungs, floor 0.226.
TEX_CAP_TOP = 0.64
TEX_CAP_LADDER = tuple(sorted(TEX_CAP_TOP / 2.0 ** (k / 2.0)
                              for k in range(4)))

# Issue the compacted quad gather as this many independent gathers over
# row partitions of the index (values are a pure partition + concat, so
# bit-equality is preserved). XLA's TPU gather lowering has strategy
# cliffs in row count (tools/measure_gather_floor.py: two half gathers
# of 363k rows measured 4.02 ms where one 726k-row gather costs 4.92).
# Default 2 is the measured best on v5e config4: split 1 -> 83.98 FPS,
# split 2 -> 85.43, split 4 -> 85.07 (bench.py A/B, docs/PERF.md r4).
import os as _os

TEX_GATHER_SPLIT = int(_os.environ.get("SR_TEX_SPLIT", "2"))

# Quad-table packing factor for the compacted sampler's gather. The
# gather is row-issue-bound and its rate is TABLE-SIZE sensitive
# (tools/measure_gather_floor.py line (f): 726k rows from a 4096-row
# table cost 3.0 ms where the same rows from 65536 cost 4.9) — so pack
# PACK quads into one wider table row and pick the right quad with a
# few VPU selects in compacted space. Selects copy exact f32 values:
# results stay bit-identical to the unpacked path.
#   1 -> [Th*Tw, 4C] (one quad/row, the classic layout)
#   2 -> [Th*Tw/2, 6C] x-pair: texels (y..y+1, 2k..2k+2), 1-bit select
#   4 -> [Th*Tw/4, 9C] 2x2 supertile: (2j..2j+2, 2k..2k+2), 2-bit
#  16 -> [Th*Tw/16, 25C] 4x4 supertile: (4j..4j+4, 4k..4k+4), 2x2-bit
#
# ALL packs RETIRED as defaults (rounds 4-5). Packs 2/4 did not cross
# the table-size threshold (84.4 / 83.9 vs 84.7 FPS unpacked). Pack 16
# wins its STANDALONE microbench (4.23 vs 6.68 ms, tools/
# measure_supertile.py) but LOSES the full pipeline: the round-4 on-chip
# A/B measured 65.5 FPS shipped-pack-16 vs 84.8 FPS pack-1 — the 75-f32
# rows (vs 12) plus 42 selects/channel cost ~3.5 ms/frame in the fused
# context the microbench never sees. This was the round-4 bench
# regression (VERDICT r4 item 1). Default 1; the knob stays for
# different table geometries. Defaults change ONLY with a full-animation
# in-pipeline A/B recorded in docs/PERF.md (CLAUDE.md shipping rule).
TEX_TABLE_PACK = int(_os.environ.get("SR_TEX_PACK", "1"))

# Route the compacted tiers through the Mosaic windowed sampler
# (ops/texture_kernel.py) when the texture shape supports it. The
# sampler beats the XLA row gather 3.7x when per-segment texel rows
# cluster (1.74 vs 6.42 ms at the tier-0.35 count, tools/
# measure_tex_kernel.py), but the bench scene's segments are UV-
# INcoherent — 128 px cross ~25 tiny objects; mean per-segment row
# spread is 120-200 of 256 and mean DISTINCT 8-row slabs is 10-22
# (tools/measure_ya_spread.py, tools/measure_slab_clusters.py), so the
# window loop runs ~25 iterations/segment and the frame regressed
# 11.8 -> 28.2 ms. PER-SEGMENT hybrid routing is bounded out too: the
# XLA gather residual keeps its ~4 ms count-independent floor, so
# peeling the <= 2-slab segments (2-17% of config4's, tools/
# measure_slab_clusters.py r5) saves only that share of the ~1 ms
# slope. Hence modes:
#   "0"        off (XLA row gather always)
#   "1"        force the kernel (UV-coherent content you control)
#   "adaptive" per-FRAME lax.cond: the kernel runs when the measured
#              total window count fits TEX_WIN_AVG_BUDGET * cap (the
#              regime where it wins outright and the XLA gather — and
#              its floor — can be skipped ENTIRELY); otherwise the XLA
#              route runs unchanged. Window counts come from
#              windowed_prep's seam-aware spans, computed in XLA
#              either way (~trivial next to the gather).
TEX_WINDOWED = _os.environ.get("SR_TEX_WINDOWED", "0")

# Adaptive-mode budget: engage the kernel when total windows <= budget
# * cap, i.e. the AVERAGE window sweep per compacted segment fits. The
# kernel costs ~0.16 us/window and the XLA line ~4.9-6.4 ms at tier
# caps (floor + slope), so break-even is ~5-7 windows/segment; 4 is
# conservatively below it (tools/measure_tex_kernel.py constants).
TEX_WIN_AVG_BUDGET = float(_os.environ.get("SR_TEX_WIN_AVG", "4"))


def _shift2(d, sy: int, sx: int, mode: str):
    """Texture shifted by (sy, sx) texels with the wrap mode baked in."""
    if mode == "repeat":
        return jnp.roll(d, (-sy, -sx), (0, 1))
    th, tw = d.shape[0], d.shape[1]
    yi = jnp.clip(jnp.arange(th) + sy, 0, th - 1)
    xi = jnp.clip(jnp.arange(tw) + sx, 0, tw - 1)
    return d[yi][:, xi]


def _packed_quad_table(tex: Texture, pack: int):
    """Packed quad table (see :data:`TEX_TABLE_PACK`).

    pack=2: [Th*Tw/2, 6C] — row (y, k) holds texels (y..y+1, 2k..2k+2),
    dx-major within dy. pack=4: [Th*Tw/4, 9C] — row (j, k) holds
    (2j..2j+2, 2k..2k+2). pack=16: [Th*Tw/16, 25C] — row (j, k) holds
    the 4x4 supertile's 5x5 patch (4j..4j+4, 4k..4k+4), dy-major. Same
    texel values as :func:`_quad_table`, so the select-extracted quads
    are bit-identical. Served from the texture's precomputed ``table``
    leaf on a pack match; built in-graph otherwise.
    """
    if tex.table is not None and tex.table_pack == pack:
        return tex.table
    return _packed_quad_table_build(tex, pack)


def _packed_quad_table_build(tex: Texture, pack: int):
    d = tex.data
    th, tw, c = d.shape
    if pack == 2:
        shifts = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]
        t = jnp.concatenate([_shift2(d, sy, sx, tex.wrap)
                             for sy, sx in shifts], axis=-1)
        t = t[:, ::2, :]                       # [Th, Tw/2, 6C]
        return t.reshape(th * (tw // 2), 6 * c).astype(tex.table_dtype)
    if pack == 16:
        shifts = [(sy, sx) for sy in range(5) for sx in range(5)]
        t = jnp.concatenate([_shift2(d, sy, sx, tex.wrap)
                             for sy, sx in shifts], axis=-1)
        t = t[::4, ::4, :]                     # [Th/4, Tw/4, 25C]
        return t.reshape((th // 4) * (tw // 4),
                         25 * c).astype(tex.table_dtype)
    assert pack == 4
    shifts = [(sy, sx) for sy in (0, 1, 2) for sx in (0, 1, 2)]
    t = jnp.concatenate([_shift2(d, sy, sx, tex.wrap)
                         for sy, sx in shifts], axis=-1)
    t = t[::2, ::2, :]                         # [Th/2, Tw/2, 9C]
    return t.reshape((th // 2) * (tw // 2), 9 * c).astype(tex.table_dtype)


def _packed_corners(quadp, px, py, c: int, pack: int, i: int):
    """Extract quad corner planes (t00, t01, t10, t11) for channel ``i``
    from gathered packed rows. px/py: x/y parity bool masks broadcastable
    against quadp[..., 0]. Pure selects of exact f32 values."""
    if pack == 2:
        def col(dy, dx):
            return quadp[..., (dy * 3 + dx) * c + i]
        t00 = jnp.where(px, col(0, 1), col(0, 0))
        t01 = jnp.where(px, col(0, 2), col(0, 1))
        t10 = jnp.where(px, col(1, 1), col(1, 0))
        t11 = jnp.where(px, col(1, 2), col(1, 1))
        return t00, t01, t10, t11

    def col(dy, dx):
        return quadp[..., (dy * 3 + dx) * c + i]

    def at(dy, dx):
        # texel (py+dy, px+dx) of the 3x3 supertile window
        a = jnp.where(px, col(dy, dx + 1), col(dy, dx))
        b = jnp.where(px, col(dy + 1, dx + 1), col(dy + 1, dx))
        return jnp.where(py, b, a)

    return at(0, 0), at(0, 1), at(1, 0), at(1, 1)


def _supertile_corners(quadp, px, py, c: int, i: int):
    """pack-16 corner extraction: binary-select the 2x2 corner set at
    in-supertile position (py, px) in [0, 4)^2 from gathered 5x5-patch
    rows (dy-major layout). Separable tree — per row dy, pick the x
    column pair (3 selects each for left/right), then pick the row pair
    by py (3 selects per corner): 42 selects/channel of exact f32, so
    results are bit-identical to the pack-1 quad path.
    px/py: int32 planes broadcastable against quadp[..., 0]."""
    xb0, xb1 = (px & 1) == 1, (px & 2) == 2
    yb0, yb1 = (py & 1) == 1, (py & 2) == 2

    def col(dy, dx):
        return quadp[..., (dy * 5 + dx) * c + i]

    def sel4(v0, v1, v2, v3, b0, b1):
        return jnp.where(b1, jnp.where(b0, v3, v2), jnp.where(b0, v1, v0))

    a = [sel4(col(dy, 0), col(dy, 1), col(dy, 2), col(dy, 3), xb0, xb1)
         for dy in range(5)]
    b = [sel4(col(dy, 1), col(dy, 2), col(dy, 3), col(dy, 4), xb0, xb1)
         for dy in range(5)]
    t00 = sel4(a[0], a[1], a[2], a[3], yb0, yb1)
    t01 = sel4(b[0], b[1], b[2], b[3], yb0, yb1)
    t10 = sel4(a[1], a[2], a[3], a[4], yb0, yb1)
    t11 = sel4(b[1], b[2], b[3], b[4], yb0, yb1)
    return t00, t01, t10, t11


def _segment_ranks(scov):
    """Rank structures for covered-segment compaction.

    scov: [Ns] bool. Returns (lc [g, gsz] f32 — segment id at each
    (group, local-rank), off [g] f32 — exclusive group offsets,
    slot [Ns] f32 — compacted slot of each segment (valid where covered),
    n_cov f32).

    Scatter/sort/cumsum-free: ranks come from two tiny triangular-mask
    matmuls (exact in f32 — all counts < 2^24), the same pattern as
    binning.live_first_permutation. A TPU sort has ~1.6 ms fixed cost
    and a [Ns] cumsum lowers to a log-depth chain of overhead-bound
    ops; these matmuls are < 3e7 MACs for Ns ~ 16k.
    """
    ns = scov.shape[0]
    gsz = 128
    g = -(-ns // gsz)
    hi = jax.lax.Precision.HIGHEST
    cov = jnp.pad(scov, (0, g * gsz - ns)).reshape(g, gsz)
    covf = cov.astype(jnp.float32)
    jj = jnp.arange(gsz, dtype=jnp.float32)
    incl = (jj[:, None] <= jj[None, :]).astype(jnp.float32)
    lrank = jax.lax.dot(covf, incl, precision=hi)   # [g, gsz] inclusive
    counts = lrank[:, -1]                           # [g]
    gi = jnp.arange(g, dtype=jnp.float32)
    before = (gi[:, None] < gi[None, :]).astype(jnp.float32)
    off = jax.lax.dot(counts, before, precision=hi)  # [g] exclusive
    n_cov = off[-1] + counts[-1]
    slot = (off[:, None] + lrank - 1.0).reshape(-1)[:ns]
    # lc: place each covered segment's id at its (group, local rank) with
    # a one-hot matmul.
    onehot = (cov[:, None, :]
              & (lrank[:, None, :] - 1.0 == jj[None, :, None])
              ).astype(jnp.float32)                  # [g, rank, seg]
    sid = gi[:, None] * gsz + jj[None, :]            # [g, seg] exact f32
    lc = jax.lax.dot_general(
        onehot, sid[:, :, None], (((2,), (1,)), ((0,), (0,))),
        precision=hi)[..., 0]                        # [g, rank] -> seg id
    return lc, off, slot, n_cov


def _comp_seg_for_cap(lc, off, cap: int, ns: int):
    """[cap] i32 segment ids occupying compacted slots 0..cap-1: resolve
    slot k to (group, local) with a monotone compare against the group
    offsets, then read the segment id out of ``lc``."""
    g, gsz = lc.shape
    k = jnp.arange(cap, dtype=jnp.float32)
    gk = jnp.sum((k[:, None] >= off[None, :]).astype(jnp.float32),
                 axis=1) - 1.0                       # [cap] group of slot
    gki = jnp.clip(gk.astype(jnp.int32), 0, g - 1)
    jk = jnp.clip((k - off[gki]).astype(jnp.int32), 0, gsz - 1)
    comp_seg = lc.reshape(-1)[gki * gsz + jk]
    return jnp.clip(comp_seg, 0.0, ns - 1).astype(jnp.int32)


def _segment_compaction_maps(scov, cap: int):
    """(comp_seg [cap] i32, slot [Ns] i32, n_cov i32) — see
    :func:`_segment_ranks`."""
    lc, off, slot, n_cov = _segment_ranks(scov)
    return (_comp_seg_for_cap(lc, off, cap, scov.shape[0]),
            jnp.clip(slot, 0.0, cap - 1).astype(jnp.int32), n_cov)


def sample_texture_planes_compacted(tex: Texture, u, v, covered,
                                    cap_fracs=TEX_CAP_LADDER):
    """Bilinear-sample only the *covered* row segments of the frame —
    equal per covered pixel (to one FMA-contraction ulp) to
    :func:`sample_texture_planes`.

    The full-frame quad gather is row-issue-bound (~3.3 ns/row on v5e —
    ~7-8 ms at 1080p, the single biggest line in the frame) and most
    rows are wasted: the north-star scene covers 16-38% of row segments
    through most of its animation (tools/measure_seg_cov.py). This path
    compacts the frame to its covered ``1 x COMPACT_SEG`` row segments —
    segment extraction is a pure reshape (no relayout), the index maps
    are two tiny matmuls (:func:`_segment_ranks`) — issues the quad
    gather for ``cap = cap_frac * n_segments`` segments' pixels, applies
    the exact same lerp expression in compacted space, and places
    segments back with one [Ns]-row gather.

    ``cap_fracs`` is an ascending tier list compiled into a nested
    ``lax.cond`` chain: a frame takes the smallest tier that fits its
    covered-segment count (the gather cost is the static cap, not the
    live count), and frames over the largest tier fall back to the
    full-frame gather — measured FREE (8.33 vs 8.37 ms plain at 1080p),
    so high-coverage frames lose nothing. Measured at 33% segment
    coverage: 5.1 ms at cap 0.35, 6.1 ms at cap 0.45, vs 8.4 plain
    (tools/measure_tex_wrapper.py). The default is the scene-agnostic
    geometric ladder :data:`TEX_CAP_LADDER` — derived from hardware
    cost constants, not from any scene's coverage histogram (see the
    constant's comment for the derivation); tiers cost nothing when
    unused, so extra levels only pay compile time. (Under vmap the
    conds become selects and every tier executes — batch callers should
    prefer scan-over-frames, as render_batch_chunked(vmap_chunk=1)
    does.)

    Uncovered pixels return finite garbage the caller's covered-mask
    zeroes out (exactly like the fused epilogue's other channels).

    u, v, covered: [H, W] planes, H*W a multiple of COMPACT_SEG.
    Returns C planes [H, W].
    """
    th, tw, c = tex.data.shape
    h, w = u.shape
    k = COMPACT_SEG
    ns = h * w // k

    from .texture_kernel import (SEG_PER_STEP, sample_segments_windowed,
                                 windowed_count, windowed_prep,
                                 windowed_supported, windowed_tables)
    mode = TEX_WINDOWED
    if mode is True:        # tests/legacy monkeypatching with a bool
        mode = "1"
    mode = "0" if mode in (False, None) else str(mode)
    win_capable = (mode in ("1", "adaptive") and TEX_TABLE_PACK == 1
                   and windowed_supported(th, tw, c, k))
    win_tabs = windowed_tables(tex.data, tex.wrap) if win_capable else None

    cov_s = covered.reshape(ns, k)
    scov = jnp.any(cov_s, axis=1)
    lc, off, slot, n_cov = _segment_ranks(scov)
    u_s = u.reshape(ns, k)
    v_s = v.reshape(ns, k)
    # Adaptive predicate: the seam-aware window count is a per-SEGMENT
    # quantity — compute it once on the [Ns, K] layout and let each
    # tier gather its compacted slots' counts (sum of tier caps is
    # ~1.6x Ns at the production ladder, so computing per tier repeats
    # the [*, K] work that many times over).
    count_all = (windowed_count(v_s, cov_s, th=th, wrap=tex.wrap)
                 if win_capable and mode == "adaptive" else None)

    def tier(cap: int):
        def run(_):
            comp_seg = _comp_seg_for_cap(lc, off, cap, ns)
            sloti = jnp.clip(slot, 0.0, cap - 1).astype(jnp.int32)
            # Per-pixel base math runs in COMPACTED space: only u/v are
            # extracted (two [cap]-row gathers); the floor/wrap/index
            # chain — identical expressions to sample_texture_planes —
            # then touches cap*K pixels instead of the whole frame
            # (measured ~1 ms of full-frame elementwise + materialized
            # [H, W] intermediates at 1080p, tools/measure_tex_caps.py).
            cu = u_s[comp_seg]                       # [cap, K]
            cv = v_s[comp_seg]

            def xla_comp(_):
                return _tier_xla_comp(cu, cv, cap)

            if not win_capable:
                comp = xla_comp(None)
            else:
                ccov = cov_s[comp_seg]

                def win_comp(_):
                    # Mosaic windowed sampler: no XLA row gather (and no
                    # ~4 ms gather floor) at all. Covered pixels match
                    # the XLA tier within the cross-compiler contraction
                    # class (tests/test_texture_kernel.py). The full
                    # index prep runs INSIDE the branch — only the taken
                    # branch pays it.
                    xa, dy, cfx, cfy, y0w, nwin = windowed_prep(
                        cu, cv, ccov, th=th, tw=tw, wrap=tex.wrap)
                    chans = sample_segments_windowed(
                        win_tabs, xa, dy, cfx, cfy, y0w, nwin,
                        th=th, tw=tw, wrap=tex.wrap)
                    return jnp.concatenate(chans, axis=1)   # [cap, C*K]

                if mode == "1":
                    comp = win_comp(None)
                else:
                    # Adaptive: the kernel costs ~0.16 us per window
                    # sweep, so its frame cost is the TOTAL window
                    # count (duplicate pad slots included — they run
                    # too); engage it only when that total fits the
                    # budget where it beats the XLA gather outright
                    # (see TEX_WIN_AVG_BUDGET). UV-incoherent frames
                    # (config4: 90-254k windows, tools/
                    # measure_slab_clusters.py) take the XLA branch.
                    # The unconditional cost is one [cap] gather of the
                    # shared per-segment counts + this sum — the first
                    # A/B's 1.27 ms prep-as-predicate overhead is what
                    # this replaces (docs/PERF.md r5).
                    total = jnp.sum(count_all[comp_seg].astype(jnp.float32))
                    comp = jax.lax.cond(
                        total <= TEX_WIN_AVG_BUDGET * cap,
                        win_comp, xla_comp, None)
            full = comp[sloti]                       # [Ns, C*K] one gather
            return [full[:, i * k:(i + 1) * k].reshape(h, w)
                    for i in range(c)]

        return run

    def _tier_xla_comp(cu, cv, cap: int):
        x = cu * tw - 0.5
        y = cv * th - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        cfx = x - x0
        cfy = y - y0
        xa = _wrap_coords(x0.astype(jnp.int32), tw, tex.wrap)
        ya = _wrap_coords(y0.astype(jnp.int32), th, tex.wrap)
        pack = TEX_TABLE_PACK
        if pack == 16 and tw % 4 == 0 and th % 4 == 0:
            ci = (ya >> 2) * (tw // 4) + (xa >> 2)
            qt = _packed_quad_table(tex, 16)
        elif pack == 2 and tw % 2 == 0:
            ci = ya * (tw // 2) + (xa >> 1)
            qt = _packed_quad_table(tex, 2)
        elif pack == 4 and tw % 2 == 0 and th % 2 == 0:
            ci = (ya >> 1) * (tw // 2) + (xa >> 1)
            qt = _packed_quad_table(tex, 4)
        else:
            pack = 1
            ci = ya * tw + xa                    # [cap, K] (2D = the
            qt = _quad_table(tex)                # fast gather)
        s = TEX_GATHER_SPLIT
        if s > 1 and cap % s == 0:
            # Partitioned issue (see TEX_GATHER_SPLIT): same rows,
            # same order, S independent gathers.
            quad = jnp.concatenate(
                [qt[ci[j * (cap // s):(j + 1) * (cap // s)]]
                 for j in range(s)], axis=0).astype(jnp.float32)
        else:
            quad = qt[ci].astype(jnp.float32)
        if pack == 16:
            px, py = xa & 3, ya & 3
        else:
            px = (xa & 1) == 1
            py = (ya & 1) == 1
        chans = []
        for i in range(c):
            if pack == 1:
                t00 = quad[..., i]
                t01 = quad[..., c + i]
                t10 = quad[..., 2 * c + i]
                t11 = quad[..., 3 * c + i]
            elif pack == 16:
                t00, t01, t10, t11 = _supertile_corners(
                    quad, px, py, c, i)
            else:
                t00, t01, t10, t11 = _packed_corners(
                    quad, px, py, c, pack, i)
            # Identical lerp expression to sample_texture_planes.
            top = t00 + (t01 - t00) * cfx
            bot = t10 + (t11 - t10) * cfx
            chans.append(top + (bot - top) * cfy)   # [cap, K]
        return jnp.concatenate(chans, axis=1)       # [cap, C*K]

    def fallback(_):
        return sample_texture_planes(tex, u, v)

    if win_capable:
        xla_fallback = fallback

        def win_full(_):
            # Full-coverage frames (coverage beyond the largest tier)
            # are ALSO the coherent content class the kernel was built
            # for — a screen-filling textured surface. In full segment
            # space there is nothing to compact: the kernel walks every
            # row segment directly and the whole-frame XLA row gather
            # (and its ~2.5-2.9 ms issue floor, tools/
            # profile_gather_floor.py) is skipped entirely. Segments
            # are padded to the kernel's grid-step multiple with
            # covered=False rows (nwin = 0 -> their window loop does
            # not run).
            ns_pad = -(-ns // SEG_PER_STEP) * SEG_PER_STEP
            pad = ns_pad - ns
            us_p = jnp.pad(u_s, ((0, pad), (0, 0)))
            vs_p = jnp.pad(v_s, ((0, pad), (0, 0)))
            cov_p = jnp.pad(cov_s, ((0, pad), (0, 0)))
            xa, dy, cfx, cfy, y0w, nwin = windowed_prep(
                us_p, vs_p, cov_p, th=th, tw=tw, wrap=tex.wrap)
            chans = sample_segments_windowed(
                win_tabs, xa, dy, cfx, cfy, y0w, nwin,
                th=th, tw=tw, wrap=tex.wrap)
            return [ch[:ns].reshape(h, w) for ch in chans]

        if mode == "1":
            fallback = win_full
        else:
            def fallback(_):
                total = jnp.sum(count_all.astype(jnp.float32))
                return jax.lax.cond(total <= TEX_WIN_AVG_BUDGET * ns,
                                    win_full, xla_fallback, None)

    chain = fallback
    cap_round = SEG_PER_STEP if win_capable else 8
    for frac in sorted(cap_fracs, reverse=True):
        cap = -(-int(frac * ns) // cap_round) * cap_round
        inner = chain

        def level(_, cap=cap, inner=inner):
            return jax.lax.cond(n_cov <= cap, tier(cap), inner, None)

        chain = level
    return list(chain(None))


def sample_texture_planes_trilinear_compacted(tex: Texture, u, v, covered,
                                              cap_fracs=TEX_CAP_LADDER):
    """Compacted trilinear: the bilinear tier chain's covered-row-segment
    compaction applied to the mipmapped sampler. The squared footprint
    (:func:`_lod_rho2`) is computed full-frame (neighbor differences
    need the planes; pure elementwise), everything transcendental
    (``log2``) and both mixed-level row gathers run in COMPACTED space
    at the engaged tier's static cap. Per covered pixel the result
    equals :func:`sample_texture_planes_trilinear` within the FMA-
    contraction ulp class (same gather rows and expressions on the same
    values; XLA contracts the lerps into FMAs differently per fusion
    context — observed max 1 ulp on CPU, tests/test_mipmap.py). Frames
    over the top tier fall back to the plain sampler.

    u, v, covered: [H, W] planes, W a multiple of COMPACT_SEG.
    Returns C planes [H, W]; uncovered pixels hold finite garbage the
    caller's covered-mask zeroes out.
    """
    th, tw, c = tex.data.shape
    h, w = u.shape
    k = COMPACT_SEG
    ns = h * w // k
    n = _num_mip_levels(th, tw)
    table = _mip_table(tex)
    offs = jnp.asarray(_mip_offsets(th, tw, n), jnp.int32)
    rho2 = _lod_rho2(u, v, th, tw)

    cov_s = covered.reshape(ns, k)
    scov = jnp.any(cov_s, axis=1)
    lc, off, slot, n_cov = _segment_ranks(scov)
    u_s = u.reshape(ns, k)
    v_s = v.reshape(ns, k)
    r_s = rho2.reshape(ns, k)

    def tier(cap: int):
        def run(_):
            comp_seg = _comp_seg_for_cap(lc, off, cap, ns)
            sloti = jnp.clip(slot, 0.0, cap - 1).astype(jnp.int32)
            cu = u_s[comp_seg]                      # [cap, K]
            cv = v_s[comp_seg]
            lod = jnp.clip(0.5 * jnp.log2(r_s[comp_seg]), 0.0,
                           float(n - 1))
            l0 = jnp.floor(lod).astype(jnp.int32)
            lf = lod - l0.astype(jnp.float32)
            l1 = jnp.minimum(l0 + 1, n - 1)
            s = TEX_GATHER_SPLIT
            lo = _tri_level_sample(table, offs, c, th, tw, tex.wrap,
                                   cu, cv, l0, split=s)
            hi = _tri_level_sample(table, offs, c, th, tw, tex.wrap,
                                   cu, cv, l1, split=s)
            chans = [a + (b - a) * lf for a, b in zip(lo, hi)]
            comp = jnp.concatenate(chans, axis=1)   # [cap, C*K]
            full = comp[sloti]                      # [Ns, C*K]
            return [full[:, i * k:(i + 1) * k].reshape(h, w)
                    for i in range(c)]

        return run

    def fallback(_):
        # Same lod expression as the tiers (footprint already computed).
        lod = 0.5 * jnp.log2(rho2)
        return sample_texture_planes_trilinear(tex, u, v, lod=lod)

    chain = fallback
    for frac in sorted(cap_fracs, reverse=True):
        cap = -(-int(frac * ns) // 8) * 8
        inner = chain

        def level(_, cap=cap, inner=inner):
            return jax.lax.cond(n_cov <= cap, tier(cap), inner, None)

        chain = level
    return list(chain(None))



def sample_texture(tex: Texture, uv):
    """Sample at uv in [0,1]^2 (u right, v down). uv: [..., 2].

    Returns [..., C] float32.
    """
    th, tw = tex.data.shape[0], tex.data.shape[1]
    c = tex.data.shape[2]
    if tex.filter == "trilinear":
        if uv.ndim != 3:
            raise ValueError(
                "trilinear sampling needs [H, W, 2] uv grids (screen-"
                "space LOD comes from finite differences of the planes);"
                " use sample_texture_planes_trilinear with an explicit"
                " lod for arbitrary uv lists")
        out = sample_texture_planes_trilinear(tex, uv[..., 0], uv[..., 1])
        return jnp.stack(out, axis=-1)
    u = uv[..., 0] * tw
    v = uv[..., 1] * th
    if tex.filter == "nearest":
        xi = _wrap_coords(jnp.floor(u).astype(jnp.int32), tw, tex.wrap)
        yi = _wrap_coords(jnp.floor(v).astype(jnp.int32), th, tex.wrap)
        flat = tex.data.reshape(th * tw, c)
        return flat[yi * tw + xi]
    if tex.filter != "bilinear":
        raise ValueError(f"unknown filter {tex.filter!r}")
    # Bilinear: sample positions at texel centers; one quad-row gather.
    x = u - 0.5
    y = v - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xa = _wrap_coords(x0.astype(jnp.int32), tw, tex.wrap)
    ya = _wrap_coords(y0.astype(jnp.int32), th, tex.wrap)
    quad = _quad_table(tex)[ya * tw + xa].astype(jnp.float32)  # [..., 4C]
    t00 = quad[..., 0:c]
    t01 = quad[..., c:2 * c]
    t10 = quad[..., 2 * c:3 * c]
    t11 = quad[..., 3 * c:4 * c]
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def checkerboard(size: int = 256, tiles: int = 8,
                 c0=(1.0, 1.0, 1.0), c1=(0.2, 0.2, 0.2)) -> Texture:
    """Procedural checkerboard (test/demo texture)."""
    ij = jnp.arange(size) * tiles // size
    mask = (ij[:, None] + ij[None, :]) % 2
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    data = jnp.where(mask[..., None] == 0, c0, c1)
    return Texture(data=data)
