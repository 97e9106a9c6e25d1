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
