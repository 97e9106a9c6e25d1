"""Framebuffer comparison helpers with *typed* tolerance classes.

The only sanctioned cross-shape/cross-backend discrepancy in this
framework is the depth-tie class: XLA fuses the depth-plane FMA
differently per output shape, which can flip the winner between two
triangles at (ulp-)equal depth along a shared edge (see
render.py:render_triangles docstring). A real sharding/slicing bug — rows
shifted, wrong offsets, stale tiles — produces pixels whose two claimed
winners sit at *different* depths, which a blanket "<0.5% of pixels
differ" tolerance cannot distinguish. ``assert_tie_class_equal`` checks
the failure mode itself: every differing pixel must be explainable as a
depth tie (both renders report ~equal depth there), not merely be rare.
"""

from __future__ import annotations

import numpy as np


def assert_fe_contraction_class(ps_a, ps_b, corners, transform, *,
                                width, height, context=""):
    """Assert two planar front-end results are equal up to the
    cross-compiler FMA-CONTRACTION class (ops/frontend.py numerics note).

    The XLA planar path and the Pallas FE kernel share one traced math
    body, but whether a compiler contracts ``mul+add`` into an FMA is a
    per-platform, per-shape codegen decision (XLA:CPU's LLVM backend
    decides per vector shape). Consequences, each bounded here from first
    principles in f64:

    * COVERAGE-critical fields stay bit-exact on every platform: the edge
      gradients a/b are differences of exactly-rounded integer pixel
      coordinates, and bbox/validity/areas/clip-w follow — asserted
      exactly.
    * Edge CONSTANTS ``c0/c1/c2``: for triangles with far-offscreen
      vertices the products ``a_j * x3`` exceed 2^24, where a contracted
      FMA keeps the product exact and mul-then-add rounds. Bound:
      ``K * eps32 * (|a_j x3| + |b_j y3|)`` (c2 inherits c0+c1+|D|'s).
    * Depth plane ``zx/zy/zc``: multiply-sum chain ulps, plus the c-
      constant error propagated through ``(c . z) * inv_area`` — for
      sliver triangles (tiny area, huge constants) this is a genuinely
      large absolute difference; both values are valid f32 roundings.

    On TPU, Mosaic and XLA:TPU agree on contraction and the hardware gate
    (tools/tpu_gate.py check_fe_kernel) asserts FULL bit-equality on the
    same scene; this class exists for XLA:CPU hosts.
    """
    # `safe` (ops/setup.py coverage_safe) is deliberately absent from both
    # lists: its threshold comparisons sit on contraction-sensitive
    # products, and a cross-compiler flip near the threshold is harmless —
    # the certificate carries a 2x margin, so either routing (fused walk
    # or bbox-clamped overflow) renders identical pixels.
    exact = ("a0", "a1", "a2", "b0", "b1", "b2", "abs_d", "inv_area",
             "area2", "bx0", "by0", "bx1", "by1", "valid",
             "w1", "w2", "w3")
    for f in exact:
        a = np.asarray(getattr(ps_a, f))
        b = np.asarray(getattr(ps_b, f))
        assert a.dtype == b.dtype and a.shape == b.shape, (context, f)
        neq = (a != b)
        if a.dtype.kind == "f":
            neq &= ~(np.isnan(a) & np.isnan(b))
        assert not neq.any(), (
            f"{context}: coverage-critical field {f} differs on "
            f"{int(neq.sum())} triangles (must be bit-exact on every "
            f"platform): {a[neq][:4]} vs {b[neq][:4]}")

    # f64 reference per-corner screen coordinates/depths (for BOUNDS only
    # — the f32 rounding instability of the coordinates themselves is
    # covered by the exact a/b/bbox assertions above).
    EPS = np.float64(2.0 ** -23)
    K = 8.0  # chain-length slack
    c3 = np.asarray(corners, np.float64)
    m = np.asarray(transform, np.float64)
    xs, ys, zs = [], [], []
    with np.errstate(invalid="ignore", over="ignore"):
        for c in range(3):
            X, Y, Z = c3[:, c, 0], c3[:, c, 1], c3[:, c, 2]
            cx = m[0, 0] * X + m[0, 1] * Y + m[0, 2] * Z + m[0, 3]
            cy = m[1, 0] * X + m[1, 1] * Y + m[1, 2] * Z + m[1, 3]
            cz = m[2, 0] * X + m[2, 1] * Y + m[2, 2] * Z + m[2, 3]
            cw = m[3, 0] * X + m[3, 1] * Y + m[3, 2] * Z + m[3, 3]
            wg = np.where(cw == 0.0, 1.0, cw)
            xs.append(np.abs((cx / wg) * 0.5 + 0.5) * width + 1.0)
            ys.append(np.abs((cy / wg) * -0.5 + 0.5) * height + 1.0)
            zs.append(np.abs(cz / wg))
    x1, x2, x3 = xs
    y1, y2, y3 = ys
    z1, z2, z3 = zs
    valid = np.asarray(ps_a.valid)
    fin = lambda v: np.where(valid & np.isfinite(v), v, 0.0)
    x1, x2, x3, y1, y2, y3 = map(fin, (x1, x2, x3, y1, y2, y3))
    z1, z2, z3 = map(fin, (z1, z2, z3))

    A = lambda f: np.abs(np.asarray(getattr(ps_a, f), np.float64))
    a0, a1, a2 = A("a0"), A("a1"), A("a2")
    b0, b1, b2 = A("b0"), A("b1"), A("b2")
    c0, c1, c2 = A("c0"), A("c1"), A("c2")
    inv = np.where(valid, np.asarray(ps_a.inv_area, np.float64), 0.0)
    tol_c0 = K * EPS * (a0 * x3 + b0 * y3)
    tol_c1 = K * EPS * (a1 * x3 + b1 * y3)
    pd = (x1 + x3) * (y2 + y3) + (x2 + x3) * (y1 + y3)
    tol_c2 = tol_c0 + tol_c1 + K * EPS * pd
    tol_zx = K * EPS * (a0 * z1 + a1 * z2 + a2 * z3) * inv
    tol_zy = K * EPS * (b0 * z1 + b1 * z2 + b2 * z3) * inv
    tol_zc = ((tol_c0 * z1 + tol_c1 * z2 + tol_c2 * z3)
              + K * EPS * (c0 * z1 + c1 * z2 + c2 * z3)) * inv

    for f, tol in (("c0", tol_c0), ("c1", tol_c1), ("c2", tol_c2),
                   ("zx", tol_zx), ("zy", tol_zy), ("zc", tol_zc)):
        a = np.asarray(getattr(ps_a, f), np.float64)
        b = np.asarray(getattr(ps_b, f), np.float64)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        with np.errstate(invalid="ignore"):
            bad = ~same & ~(np.abs(a - b) <= tol + 1e-9)
        assert not bad.any(), (
            f"{context}: {f} differs beyond the contraction class on "
            f"{int(bad.sum())} triangles: {a[bad][:4]} vs {b[bad][:4]} "
            f"(tol {tol[bad][:4]}) — a real kernel bug, not "
            f"cross-compiler FMA contraction")


def assert_tie_class_equal(color_a, color_b, depth_a, depth_b, *,
                           max_diff_frac: float = 0.005,
                           atol: float = 1e-6,
                           tie_rtol: float = 1e-4,
                           context: str = ""):
    """Assert two renders are equal up to the depth-tie ulp class.

    color_*: [..., H, W, 4]; depth_*: [..., H, W] (leading batch dims ok).

    Three conditions, each matching the *claimed* failure mode:
      1. few pixels differ at all (``max_diff_frac``);
      2. every color-differing pixel is a depth TIE: the two renders'
         winning depths there agree to ``tie_rtol`` relative (two
         triangles at equal depth — a flipped tie), so a 1-row shift or a
         stale tile (different triangles at different depths) fails even
         if it moves < max_diff_frac of pixels;
      3. depth-only differences stay in the same tie/ulp class.
    """
    color_a = np.asarray(color_a)
    color_b = np.asarray(color_b)
    depth_a = np.asarray(depth_a)
    depth_b = np.asarray(depth_b)

    bad_c = (~np.isclose(color_a, color_b, atol=atol)).any(axis=-1)
    bad_d = ~np.isclose(depth_a, depth_b, atol=atol)
    assert bad_c.mean() <= max_diff_frac, (
        f"{context}: {bad_c.mean():.4%} of pixels differ in color "
        f"(> {max_diff_frac:.2%})")
    assert bad_d.mean() <= max_diff_frac, (
        f"{context}: {bad_d.mean():.4%} of pixels differ in depth "
        f"(> {max_diff_frac:.2%})")

    diff = bad_c | bad_d
    if not diff.any():
        return
    da = depth_a[diff]
    db = depth_b[diff]
    # Both renders must agree the pixel's surface depth (to tie ulps):
    # uncovered-vs-covered flips (inf vs finite) and different-depth
    # winners are real bugs, not ties. inf == inf passes via the
    # subtraction-free relative test.
    both_finite = np.isfinite(da) & np.isfinite(db)
    both_inf = np.isinf(da) & np.isinf(db)
    scale = np.maximum(np.abs(da), np.abs(db))
    tie = both_inf | (both_finite
                      & (np.abs(da - db) <= tie_rtol * np.maximum(scale, 1e-6)))
    n_bad = int((~tie).sum())
    assert n_bad == 0, (
        f"{context}: {n_bad} differing pixel(s) are NOT depth ties "
        f"(winner depths disagree beyond rtol={tie_rtol}): e.g. "
        f"{da[~tie][:4]} vs {db[~tie][:4]} — a real slicing/sharding bug, "
        f"not the sanctioned tie-flip class")
