"""Probe: how many (tile, band)-pair emissions would exact per-band-row
x-intervals save vs the bbox-rectangle emission?

For each sampled frame of the config4 animation, compute per-triangle
band spans on the production grid (tile 64x128, bands 4 -> bh 16) two
ways: the shipped bbox rectangle (span_w * span_h) and a per-band-row
x-interval from the three edge half-planes (the candidate emission).
Prints the binned-pair totals and the ratio — the expected shrink of the
fused kernel's live record count (docs/PERF.md backlog #3).

Run on CPU: JAX_PLATFORMS=cpu python tools/measure_band_spans.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.ops import frontend as fe  # noqa: E402

TILE_W, TILE_H, BANDS = 128, 64, 4
BH = TILE_H // BANDS
KMAX = 12 * BANDS


def spans(time):
    rp = scenes.config4_many_objects(time)
    mesh = rp.mesh
    corners = np.asarray(mesh.positions)[np.asarray(mesh.indices)].reshape(
        -1, 3, 3)
    ps = fe.planar_front(fe.corner_cols(corners), rp.transform,
                         rp.width, rp.height, cull_backfaces=True)
    g = {k: np.asarray(getattr(ps, k)) for k in
         ("a0", "a1", "a2", "b0", "b1", "b2", "c0", "c1", "c2",
          "bx0", "by0", "bx1", "by1", "valid")}
    gw = -(-rp.width // TILE_W)
    gbands = -(-rp.height // TILE_H) * BANDS
    tx0 = g["bx0"] // TILE_W
    tx1 = g["bx1"] // TILE_W
    ty0 = np.clip(g["by0"] // BH, 0, gbands - 1)
    ty1 = np.clip(g["by1"] // BH, 0, gbands - 1)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    nspan_bbox = span_w * span_h
    valid = g["valid"]
    small = valid & (nspan_bbox <= KMAX)

    # Exact per-row interval (float64 here — the probe wants the ideal
    # bound; the production version pads for f32 rounding).
    a = np.stack([g["a0"], g["a1"], g["a2"]]).astype(np.float64)  # [3, T]
    b = np.stack([g["b0"], g["b1"], g["b2"]]).astype(np.float64)
    c = np.stack([g["c0"], g["c1"], g["c2"]]).astype(np.float64)
    t = a.shape[1]
    nspan_exact = np.zeros(t, np.int64)
    multi = span_w >= 2
    rmax = int(span_h[valid].max()) if valid.any() else 1
    for r in range(rmax):
        act = valid & (r < span_h)
        gb = ty0 + r
        ylo = gb * BH + 0.5
        yhi = ylo + (BH - 1)
        # x bounds from each half-plane a x + b y + c >= 0 over the slab.
        with np.errstate(divide="ignore", invalid="ignore"):
            q_lo = np.minimum((-c - b * ylo) / a, (-c - b * yhi) / a)
            q_hi = np.maximum((-c - b * ylo) / a, (-c - b * yhi) / a)
        xlo = np.where(a > 0, q_lo, -np.inf).max(axis=0)
        xhi = np.where(a < 0, q_hi, np.inf).min(axis=0)
        plo = np.maximum(np.floor(xlo - 0.5).astype(np.int64), 0)
        phi = np.ceil(xhi - 0.5).astype(np.int64)
        tlo = np.maximum(plo // TILE_W, tx0)
        thi = np.minimum(np.where(phi >= 0, phi // TILE_W, -1), tx1)
        w = np.where(act, np.maximum(thi - tlo + 1, 0), 0)
        nspan_exact += w
    # Both totals over ONE common subset (the bbox-binned triangles
    # `small`) so the printed ratio is apples-to-apples: a triangle that
    # overflows the bbox emission but fits exactly must not inflate only
    # the exact-side total (round-3 advisor finding). Production would
    # bin by the bbox test, so `small` is the operative population.
    small_e = valid & (nspan_exact <= KMAX) & (span_h <= KMAX)
    return (int(nspan_bbox[small].sum()), int(nspan_exact[small].sum()),
            int(small.sum()), int(small_e.sum()),
            int(nspan_bbox[small & multi].sum()),
            int(valid.sum()))


for time in (0.1, 0.5, 1.0, 1.5, 2.0, 2.5, 2.8, 3.2, 3.6, 4.0):
    pb, pe, ns, nse, pm, nv = spans(time)
    print(f"t={time:4.1f}: bbox pairs {pb:7d} exact {pe:7d} "
          f"ratio {pe / max(pb, 1):.3f} | binned tris {ns} -> {nse} "
          f"(valid {nv}) | bbox pairs from span_w>=2 tris: {pm}")
