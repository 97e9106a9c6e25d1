"""Mosaic windowed texture sampler: per-lane gathers over per-segment
texture windows — replaces the XLA row gather in the compacted bilinear
path (the frame's biggest tail line).

Why: the XLA quad-table row gather is row-ISSUE-bound at ~1.3 ns/row
with a ~4 ms count-independent floor on v5e (tools/measure_gather_floor
.py) — 726k compacted rows cost ~4-5 ms/frame however they are shaped,
packed, or split. Mosaic's ``tpu.dynamic_gather`` (exposed as
``jnp.take_along_axis`` on a 2D block, jax lowering.py
_gather_lowering_rule) moves the lookup to VPU shuffle rate instead:

  axis=1: out[i, j] = x[i, idx[i, j]]   per-sublane pick across lanes
  axis=0: out[i, j] = x[idx[i, j], j]   per-lane pick across sublanes

Neither primitive does an arbitrary 65k-entry lookup, but the sampler
doesn't need one: within a compacted 1x128 screen segment the covered
pixels' texel rows cluster (triangles are ~15 px, UVs are continuous
across a mesh — tools/measure_ya_spread.py), so per segment the kernel

  1. dynamic-slices a [16, tw] row window of the VMEM-resident texture
     at the segment's 8-aligned min covered texel row,
  2. lane-gathers the two corner columns (xa, xa+1 with the wrap baked
     in) across the window's 128-lane column tiles,
  3. sublane-gathers the two corner rows (dy, dy+1) out of the columns,
  4. lerps with the same expression as ops/texture.py and accumulates.

Segments whose covered texel rows spread wider than one window run the
window loop multiple times (stride 8, masked accumulate — carries are
three [1, 128] planes, cheap); the v-wrap seam is handled by padding
the table with WINH wrapped rows so window slices never wrap.

All gathers move exact f32 texel values and the lerp expression matches
ops/texture.py:sample_texture_planes, so results on covered pixels are
equal to the XLA path within the cross-compiler FMA-contraction class
(bit-equal where the compilers contract alike; the TPU gate verifies
equality on hardware — tools/tpu_gate.py).

The reference has no texture path at all (SURVEY.md component 17: UVs
are loaded but dropped, App.swift:129-133); this implements the north
star's bilinear sampling (BASELINE.json configs 2/4) at TPU speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_pallas import default_interpret

# Window geometry. Mosaic's dynamic_gather lowers ONLY at exactly
# [8, 128] on v5e (tools/probe_dyngather.py: every larger block shape
# fails tpu_compile) — one vreg, both axes. So a window iteration works
# on an 8-row window slice whose start is 8-sublane-aligned, covers
# dy in [8w, 8w+8), and fetches the bilinear +1 row for dy == 8w+7 from
# the NEXT 8-row slice's first row (one extra lane pick + select). The
# table is padded by WINH wrapped rows so both slices always exist.
WINH = 16
WIN_STRIDE = 8

# Segments (compacted 1x128 pixel rows) per grid step. Amortizes grid
# overhead; each segment's work is a few dozen vector ops.
SEG_PER_STEP = 32

# Lane width of one gather tile (= TPU vector lane count).
LANES = 128


def windowed_supported(th: int, tw: int, c: int, k: int) -> bool:
    """Static support test for the kernel path.

    tw must split into whole 128-lane column tiles (the lane gather works
    per tile; tiles are combined with a select chain); th must be a
    multiple of 8 so every window start — including wrap-seam restarts at
    ``(y0 + 8w) % th`` — stays sublane-aligned; and the padded table must
    stay comfortably VMEM-resident. Anything else falls back to the XLA
    row gather (ops/texture.py).
    """
    if k != LANES or c < 1 or c > 4:
        return False
    if tw % LANES or tw // LANES > 4:
        return False
    if th < 8 or th % 8 or (th + WINH) * tw * c * 4 > 6 << 20:
        return False
    return True


def windowed_prep(u, v, cov, *, th: int, tw: int, wrap: str):
    """XLA-side per-pixel/per-segment index prep for the windowed kernel.

    u, v: [cap, 128] compacted UV planes; cov: [cap, 128] bool covered
    mask (uncovered lanes are excluded from the per-segment window base
    and iteration count; their per-pixel indices may be garbage — the
    kernel clamps them in-window and the caller discards their values).

    The base math is expression-for-expression the same as
    ops/texture.py:sample_texture_planes so covered texels and fractions
    are bit-identical to the XLA path.

    The window base is SEAM-AWARE (round 5): the kernel walks windows
    circularly from ``y0`` (window w covers texel rows ``(y0 + 8w) mod
    th`` ..+8), so the right base is the occupied 8-row slab that
    minimizes the circular span over the segment's covered slabs — i.e.
    the slab just past the largest circular gap. The previous min-
    covered-row base made a ``wrap='repeat'`` segment straddling the
    v-seam (rows near 0 AND near th-1) walk essentially the whole
    texture (``nwin ~ th/8``, ADVICE r4); the span-minimizing base walks
    exactly the occupied arc (seam case: nwin ~ 2). Exact for clamp
    too — the walk's row arithmetic is mod th either way. Cost:
    O(S^2) per segment for S = th/8 slabs via one [cap, S] occupancy
    reduce + a [cap, S, S] masked max against a static span matrix
    (S = 32 at th = 256 — trivially VPU-fused next to the base math).

    Segments with no covered lane return ``nwin = 0`` (the kernel's
    window loop does not run; its output lanes are zero and the caller
    discards them).

    Returns (xa, dy, fx, fy, y0, nwin) per :func:`sample_segments_windowed`.
    """
    x = u * tw - 0.5
    y = v * th - 0.5
    x0 = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0
    fy = y - y0f
    if wrap == "repeat":
        xa = jnp.mod(x0.astype(jnp.int32), tw)
        ya = jnp.mod(y0f.astype(jnp.int32), th)
    else:
        xa = jnp.clip(x0.astype(jnp.int32), 0, tw - 1)
        ya = jnp.clip(y0f.astype(jnp.int32), 0, th - 1)
    s = th // WIN_STRIDE
    sidx = jnp.arange(s, dtype=jnp.int32)
    slab = ya // WIN_STRIDE                             # [cap, K] in [0, s)
    occ = jnp.any(cov[:, :, None] & (slab[:, :, None] == sidx), axis=1)
    # span[seg, b] = max over occupied slabs of (slab - b) mod s; -1 when
    # the segment has no covered lane at all.
    smat = jnp.mod(sidx[None, :] - sidx[:, None], s)    # [base, slab]
    span = jnp.max(jnp.where(occ[:, None, :], smat[None], -1), axis=2)
    base = jnp.argmin(jnp.where(occ, span, s + 1), axis=1).astype(jnp.int32)
    y0 = base * WIN_STRIDE
    dy = jnp.mod(ya - y0[:, None], th)
    nwin = jnp.take_along_axis(span, base[:, None], axis=1)[:, 0] + 1
    return xa, dy, fx, fy, y0, nwin


def windowed_count(v, cov, *, th: int, wrap: str):
    """Seam-aware per-segment window count — the adaptive routing
    predicate, equal to :func:`windowed_prep`'s ``nwin`` (tested) but
    computed WITHOUT the prep's [cap, K, S] occupancy reduce or
    [cap, S, S] span matrix, because in adaptive mode this runs
    UNCONDITIONALLY every frame while the prep runs only inside the
    engaged branch (the first in-pipeline A/B measured the prep-as-
    predicate at ~1.27 ms/frame on config4, docs/PERF.md round 5).

    Mechanics: slab occupancy is packed into ceil(S/32) int32 bitmask
    words with a lane-dim bitwise-or reduce ([cap, K] work); the minimal
    circular span over occupied 8-row slabs is then 1 + (p(i) - i) mod S
    minimized over occupied i, where p(i) — the previous occupied slab
    strictly before i, circularly — comes from one cummax over the
    doubled slab axis ([cap, 2S] work). Segments with no covered lane
    return 0.
    """
    y = v * th - 0.5
    y0f = jnp.floor(y)
    if wrap == "repeat":
        ya = jnp.mod(y0f.astype(jnp.int32), th)
    else:
        ya = jnp.clip(y0f.astype(jnp.int32), 0, th - 1)
    s = th // WIN_STRIDE
    slab = ya // WIN_STRIDE                             # [cap, K] in [0, s)
    nw = -(-s // 32)
    sidx = jnp.arange(s, dtype=jnp.int32)
    words = []
    for w in range(nw):
        in_w = cov & (slab // 32 == w)
        bits = jnp.where(in_w, jnp.int32(1) << (slab & 31), jnp.int32(0))
        words.append(jax.lax.reduce(bits, jnp.int32(0),
                                    jax.lax.bitwise_or, (1,)))
    bits_words = jnp.stack(words, axis=1)               # [cap, nw]
    occ = (bits_words[:, sidx // 32] >> (sidx & 31)) & 1  # [cap, S]
    occ = occ.astype(bool)
    # p(i): index of the previous occupied slab strictly before i,
    # circular — last-occupied-position cummax over the doubled axis,
    # shifted one right (exclusive), second copy taken.
    occ2 = jnp.concatenate([occ, occ], axis=1)          # [cap, 2S]
    j2 = jnp.arange(2 * s, dtype=jnp.int32)
    incl = jax.lax.cummax(jnp.where(occ2, j2, -1), axis=1)
    pexcl = jnp.pad(incl[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    p = jnp.mod(pexcl[:, s:], s)                        # [cap, S]
    span = jnp.mod(p - sidx[None, :], s)
    minspan = jnp.min(jnp.where(occ, span, s + 1), axis=1)
    return jnp.where(jnp.any(cov, axis=1), minspan + 1, 0)


def windowed_tables(data, wrap: str):
    """Per-channel [th + WINH, tw] f32 tables with WINH wrap-padded rows
    so window slices never wrap. data: [th, tw, c]."""
    th = data.shape[0]
    if wrap == "repeat":
        pad = data[: WINH] if th >= WINH else jnp.concatenate(
            [data] * -(-WINH // th), axis=0)[:WINH]
    else:  # clamp
        pad = jnp.broadcast_to(data[-1:], (WINH,) + data.shape[1:])
    full = jnp.concatenate([data, pad], axis=0).astype(jnp.float32)
    return [full[:, :, i] for i in range(data.shape[2])]


def _lane_pick(win, xlb, xhb, nh: int):
    """Per-sublane lane gather of per-lane column ``x`` from ``win``
    [8, nh*LANES]: gather each 128-lane column tile ([8, 128] is the
    ONLY dynamic_gather shape Mosaic accepts), then select by tile
    index. xlb/xhb: [8, LANES] broadcast x % 128 and x // 128. Pure
    moves of exact f32."""
    cols = [jnp.take_along_axis(win[:, h * LANES:(h + 1) * LANES], xlb, 1)
            for h in range(nh)]
    out = cols[0]
    for h in range(1, nh):
        out = jnp.where(xhb == h, cols[h], out)
    return out


def _sampler_kernel(y0_ref, nwin_ref, xa_ref, dy_ref, fx_ref, fy_ref,
                    *refs, c: int, th: int, tw: int, wrap: str):
    g = pl.program_id(0)
    tab_refs = refs[:c]
    out_refs = refs[c:]
    nh = tw // LANES
    for s in range(SEG_PER_STEP):
        y0 = y0_ref[0, g * SEG_PER_STEP + s]
        nw = nwin_ref[0, g * SEG_PER_STEP + s]
        xa = xa_ref[s:s + 1, :]
        if wrap == "repeat":
            xb = jnp.where(xa + 1 == tw, 0, xa + 1)
        else:
            xb = jnp.minimum(xa + 1, tw - 1)
        xab = (jnp.broadcast_to(xa % LANES, (8, LANES)),
               jnp.broadcast_to(xa // LANES, (8, LANES)))
        xbb = (jnp.broadcast_to(xb % LANES, (8, LANES)),
               jnp.broadcast_to(xb // LANES, (8, LANES)))
        dy = dy_ref[s:s + 1, :]
        fx = fx_ref[s:s + 1, :]
        fy = fy_ref[s:s + 1, :]

        def body(w, accs, y0=y0, xab=xab, xbb=xbb, dy=dy, fx=fx, fy=fy):
            # The trailing * 8 lets Mosaic statically prove the dynamic
            # sublane-slice starts are 8-aligned (it cannot see through
            # an SMEM load + mod; "cannot statically prove that index in
            # dimension 0 is a multiple of 8" otherwise).
            start = ((y0 // 8 + w) % (th // 8)) * 8
            dyw = dy - w * WIN_STRIDE
            m = (dyw >= 0) & (dyw < WIN_STRIDE)
            d0 = jnp.clip(dyw, 0, WIN_STRIDE - 1)
            d0b = jnp.broadcast_to(d0, (8, LANES))
            # +1 row: within the top slice except dy == 7, whose corner
            # row is the NEXT slice's first row.
            last = d0 == WIN_STRIDE - 1
            d1b = jnp.broadcast_to(jnp.minimum(d0 + 1, WIN_STRIDE - 1),
                                   (8, LANES))
            out = []
            for ci in range(c):
                top = tab_refs[ci][pl.ds(start, 8), :]
                bot = tab_refs[ci][pl.ds(start + 8, 8), :]
                ca_t = _lane_pick(top, *xab, nh)
                cb_t = _lane_pick(top, *xbb, nh)
                ca_b = _lane_pick(bot, *xab, nh)
                cb_b = _lane_pick(bot, *xbb, nh)
                t00 = jnp.take_along_axis(ca_t, d0b, 0)[0:1]
                t01 = jnp.take_along_axis(cb_t, d0b, 0)[0:1]
                t10 = jnp.where(last, ca_b[0:1],
                                jnp.take_along_axis(ca_t, d1b, 0)[0:1])
                t11 = jnp.where(last, cb_b[0:1],
                                jnp.take_along_axis(cb_t, d1b, 0)[0:1])
                # Identical lerp expression to sample_texture_planes.
                top_l = t00 + (t01 - t00) * fx
                bot_l = t10 + (t11 - t10) * fx
                val = top_l + (bot_l - top_l) * fy
                out.append(accs[ci] + jnp.where(m, val, 0.0))
            return tuple(out)

        accs = tuple(jnp.zeros((1, LANES), jnp.float32) for _ in range(c))
        accs = jax.lax.fori_loop(0, nw, body, accs)
        for ci in range(c):
            out_refs[ci][s, :] = accs[ci][0]


def _windowed_call(tables, xa, dy, fx, fy, y0, nwin, *,
                   th: int, tw: int, wrap: str, interpret: bool):
    cap = xa.shape[0]
    c = len(tables)
    assert cap % SEG_PER_STEP == 0 and xa.shape[1] == LANES
    grid = cap // SEG_PER_STEP

    seg_spec = pl.BlockSpec((SEG_PER_STEP, LANES), lambda g: (g, 0))
    # SMEM blocks must span the full minor dim (Mosaic block-shape rule);
    # the kernel indexes them at g*SEG_PER_STEP + s.
    smem_spec = pl.BlockSpec((1, cap), lambda g: (0, 0),
                             memory_space=pltpu.SMEM)
    tab_spec = pl.BlockSpec(tables[0].shape, lambda g: (0, 0))

    kern = functools.partial(_sampler_kernel, c=c, th=th, tw=tw, wrap=wrap)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem_spec, smem_spec, seg_spec, seg_spec, seg_spec,
                  seg_spec] + [tab_spec] * c,
        out_specs=[seg_spec] * c,
        out_shape=[jax.ShapeDtypeStruct((cap, LANES), jnp.float32)] * c,
        interpret=interpret,
    )(y0.reshape(1, -1).astype(jnp.int32),
      nwin.reshape(1, -1).astype(jnp.int32),
      xa, dy, fx, fy, *tables)
    return list(outs)


def _xla_equivalent(tables, xa, dy, fx, fy, y0, *, th: int, tw: int,
                    wrap: str):
    """Differentiable XLA twin of the kernel's covered-lane math: corner
    gathers from the padded tables + the same lerp. Used only inside the
    backward pass (training paths), where the row gather's cost is
    acceptable; uncovered lanes receive zero cotangents through
    finish_fused's covered mask, so their value mismatch (the kernel
    zeroes lanes outside every window) never contributes."""
    ya = jnp.mod(y0[:, None] + dy, th)
    if wrap == "repeat":
        xb = jnp.where(xa + 1 == tw, 0, xa + 1)
    else:
        xb = jnp.minimum(xa + 1, tw - 1)
    yb = ya + 1  # row th is the first wrap-padded row: valid in `tables`
    out = []
    for tab in tables:
        flat = tab.reshape(-1)
        t00 = flat[ya * tw + xa]
        t01 = flat[ya * tw + xb]
        t10 = flat[yb * tw + xa]
        t11 = flat[yb * tw + xb]
        top = t00 + (t01 - t00) * fx
        bot = t10 + (t11 - t10) * fx
        out.append(top + (bot - top) * fy)
    return out


@functools.lru_cache(maxsize=None)
def _windowed_vjp(c: int, th: int, tw: int, wrap: str, interpret: bool):
    import numpy as np

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    @jax.custom_vjp
    def f(tables, xa, dy, fx, fy, y0, nwin):
        return _windowed_call(list(tables), xa, dy, fx, fy, y0, nwin,
                              th=th, tw=tw, wrap=wrap, interpret=interpret)

    def fwd(tables, xa, dy, fx, fy, y0, nwin):
        return f(tables, xa, dy, fx, fy, y0, nwin), (tables, xa, dy, fx,
                                                     fy, y0, nwin)

    def bwd(res, cots):
        tables, xa, dy, fx, fy, y0, nwin = res
        _, vjp = jax.vjp(
            lambda tabs, fxa, fya: _xla_equivalent(
                tabs, xa, dy, fxa, fya, y0, th=th, tw=tw, wrap=wrap),
            tables, fx, fy)
        gtab, gfx, gfy = vjp(list(cots))
        return gtab, f0(xa), f0(dy), gfx, gfy, f0(y0), f0(nwin)

    f.defvjp(fwd, bwd)
    return f


def sample_segments_windowed(tables, xa, dy, fx, fy, y0, nwin, *,
                             th: int, tw: int, wrap: str,
                             interpret: bool | None = None):
    """Bilinear-sample compacted segments via per-segment texture windows.

    tables: C per-channel [th + WINH, tw] f32 (:func:`windowed_tables`).
    xa: [cap, 128] i32 left texel column (in [0, tw)).
    dy: [cap, 128] i32 texel row relative to the segment's window base,
        ``(ya - y0) mod th`` (garbage on uncovered lanes is fine — their
        contributions are masked per window and the caller discards them).
    fx, fy: [cap, 128] f32 bilinear fractions.
    y0: [cap] i32 8-aligned window base row per segment (in [0, th)).
    nwin: [cap] i32 window iterations per segment (>= 1 to sample
        anything; 1 + max_covered_dy // WIN_STRIDE).

    Returns C [cap, 128] f32 planes. Covered lanes match the XLA
    sampler's values within the cross-compiler contraction class; lanes
    never inside any window return 0. Differentiable w.r.t. tables and
    fx/fy via a custom VJP whose backward runs the XLA twin
    (:func:`_xla_equivalent`) — texture-training paths keep working.
    """
    if interpret is None:
        interpret = default_interpret()
    fn = _windowed_vjp(len(tables), th, tw, wrap, interpret)
    return fn(tuple(tables), xa, dy, fx, fy, y0, nwin)
