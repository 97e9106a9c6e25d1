"""Deferred resolve: visibility buffer -> interpolated attributes -> color.

The reference interpolates color inside its innermost loops for every
candidate pixel that passes the z-test (Renderer.swift:263-268,
Shaders.metal:162-163), doing redundant work for occluded fragments. The
TPU-native design defers all attribute work: the visibility pass produces
only (depth, triangle id) per pixel, and this stage shades each pixel
exactly once — a handful of vectorized gathers and FMAs over the whole
frame, which XLA fuses into one pass over HBM.

Interpolation is *screen-space linear* (not perspective-correct), matching
the reference (Shaders.metal:157,162 interpolate with screen-space
barycentrics; SURVEY.md component 15). Perspective-correct mode is a
documented extension flag.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..framebuffer import NO_TRIANGLE
from .rasterize_ref import pixel_centers
from .setup import TriangleSetup


def barycentrics_at_pixels(setup: TriangleSetup, tri_id, y_start=0):
    """Per-pixel normalized barycentric weights for the winning triangle.

    Args:
      setup: triangle setup.
      tri_id: [H, W] int32 winning triangle per pixel (NO_TRIANGLE = none).
      y_start: global row offset of this slice (row sharding).

    Returns:
      ws: [H, W, 3] float32 — weights (garbage where uncovered; callers
        mask with ``covered``).
      covered: [H, W] bool.
    """
    h, w = tri_id.shape
    covered = tri_id != NO_TRIANGLE
    tid = jnp.where(covered, tri_id, 0)
    coef = setup.coef[tid]            # [H, W, 3, 3]
    inv_area = setup.inv_area[tid]    # [H, W]
    xs, ys = pixel_centers(w, h, y_start)
    e = (xs[..., None] * coef[..., 0, :]
         + ys[..., None] * coef[..., 1, :]
         + coef[..., 2, :])           # [H, W, 3]
    return e * inv_area[..., None], covered


def perspective_correct_weights(ws, w_tri, tri_id, covered):
    """Optional perspective-correct weights (extension; the reference is
    screen-space linear — Shaders.metal:157,162).

    ws: [H, W, 3] screen-space weights; w_tri: [T, 3] clip-space w per
    corner (from ops/vertex.py). Returns corrected [H, W, 3]:
        ws'_i = (ws_i / w_i) / sum_j (ws_j / w_j)
    """
    tid = jnp.where(covered, tri_id, 0)
    wv = w_tri[tid]  # [H, W, 3]
    wr = ws / jnp.where(wv == 0.0, 1.0, wv)
    denom = jnp.sum(wr, axis=-1, keepdims=True)
    return wr / jnp.where(denom == 0.0, 1.0, denom)


def interpolate_attribute(attr_tri, tri_id, ws, covered, fill=0.0):
    """Interpolate a per-vertex attribute over the frame.

    Args:
      attr_tri: [T, 3, K] attribute values at each triangle's 3 vertices
        (pre-gathered via ``attr[tris]``).
      tri_id: [H, W] int32.
      ws: [H, W, 3] barycentric weights.
      covered: [H, W] bool.
      fill: value for uncovered pixels.

    Returns: [H, W, K] float32.
    """
    tid = jnp.where(covered, tri_id, 0)
    vals = attr_tri[tid]  # [H, W, 3, K]
    # Explicit multiply-sum: stays on the VPU at full f32 (einsum would use
    # the MXU's bf16 default precision).
    out = jnp.sum(ws[..., None] * vals, axis=-2)
    return jnp.where(covered[..., None], out, fill)
