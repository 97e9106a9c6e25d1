"""Scalar numpy oracle: a line-by-line-faithful model of the reference's
rendering semantics, used only by tests.

This is the semantic contract extracted from the reference's *active* GPU
path (renderer/Shaders.metal vertex_pass:57-75 + rasterizer_pass:123-167,
host loop GpuRenderer.swift:109-140) with the depth semantics the CPU
legacy path agrees on (Renderer.swift:339-356): strict less-than z-test
against a +inf-cleared buffer, triangles processed sequentially in index
order, screen-space-linear attribute interpolation, transparent-black
background.

Deliberately slow and simple — numpy per triangle over its bbox. Never used
at render time.
"""

from __future__ import annotations

import numpy as np


def oracle_vertex_stage(positions, transform, width, height):
    """Shaders.metal:57-75 in float32 numpy."""
    positions = np.asarray(positions, np.float32)
    m = np.asarray(transform, np.float32)
    clip = positions @ m[:, :3].T + m[:, 3]  # [N, 4]
    w = clip[:, 3]
    ndc = (clip[:, :3].T / w).T.astype(np.float32)
    uv = ndc[:, :2] * np.array([0.5, -0.5], np.float32) + np.float32(0.5)
    scaled = uv * np.array([width, height], np.float32)
    # Round half away from zero (Swift .toNearestOrAwayFromZero /
    # Metal round) — sign-aware, matching ops/vertex.py round_half_away.
    pix = np.sign(scaled) * np.floor(np.abs(scaled) + np.float32(0.5))
    return np.concatenate([pix, ndc[:, 2:3]], axis=-1).astype(np.float32)


@np.errstate(divide="ignore", invalid="ignore")
def oracle_rasterize(screen, tris, colors_tri, width, height):
    """Sequential per-triangle rasterization (Shaders.metal:123-167).

    Args:
      screen: [N, 3] float32 screen vertices (pixel x, pixel y, ndc z).
      tris: [T, 3] int.
      colors_tri: [T, 3, 3] per-corner RGB.

    Returns (color [H,W,4] float32, depth [H,W] float32, tri_id [H,W] int32).
    """
    screen = np.asarray(screen, np.float32)
    tris = np.asarray(tris)
    color = np.zeros((height, width, 4), np.float32)
    depth = np.full((height, width), np.inf, np.float32)
    tri_id = np.full((height, width), -1, np.int32)

    # Degenerate triangles: the reference divides by a zero divider too;
    # NaN/inf weights simply fail the inside test (NaN comparisons are
    # false), same as Metal — hence the errstate suppression above.
    for t in range(tris.shape[0]):
        p1, p2, p3 = screen[tris[t, 0]], screen[tris[t, 1]], screen[tris[t, 2]]
        if not (np.isfinite(p1).all() and np.isfinite(p2).all()
                and np.isfinite(p3).all()):
            continue
        divider = np.float32(
            (p1[0] - p3[0]) * (p2[1] - p3[1])
            - (p2[0] - p3[0]) * (p1[1] - p3[1])
        )  # Shaders.metal:143
        xs = np.array([p1[0], p2[0], p3[0]])
        ys = np.array([p1[1], p2[1], p3[1]])
        x0 = max(int(np.floor(xs.min())), 0)
        x1 = min(int(np.ceil(xs.max())), width - 1)
        y0 = max(int(np.floor(ys.min())), 0)
        y1 = min(int(np.ceil(ys.max())), height - 1)
        if x0 > x1 or y0 > y1:
            continue
        # Pixel centers (Shaders.metal:133).
        px = (np.arange(x0, x1 + 1, dtype=np.float32) + np.float32(0.5))[None, :]
        py = (np.arange(y0, y1 + 1, dtype=np.float32) + np.float32(0.5))[:, None]
        # Edge functions exactly as Shaders.metal:144-149.
        w0 = ((p2[1] - p3[1]) * (px - p3[0])
              + (p3[0] - p2[0]) * (py - p3[1])) / divider
        w1 = ((p3[1] - p1[1]) * (px - p3[0])
              + (p1[0] - p3[0]) * (py - p3[1])) / divider
        w2 = 1.0 - w0 - w1
        inside = ((0 <= w0) & (w0 <= 1) & (0 <= w1) & (w1 <= 1)
                  & (0 <= w2) & (w2 <= 1))  # Shaders.metal:153
        z = w0 * p1[2] + w1 * p2[2] + w2 * p3[2]  # Shaders.metal:157
        zbuf = depth[y0:y1 + 1, x0:x1 + 1]
        write = inside & (z < zbuf)  # Shaders.metal:161 strict less-than
        c = (w0[..., None] * colors_tri[t, 0]
             + w1[..., None] * colors_tri[t, 1]
             + w2[..., None] * colors_tri[t, 2])  # Shaders.metal:162
        rgba = np.concatenate(
            [c, np.ones_like(c[..., :1])], axis=-1).astype(np.float32)
        region = color[y0:y1 + 1, x0:x1 + 1]
        region[write] = rgba[write]
        zbuf[write] = z[write].astype(np.float32)
        ids = tri_id[y0:y1 + 1, x0:x1 + 1]
        ids[write] = t
    return color, depth, tri_id


def oracle_render(positions, tris, colors, transform, width, height):
    """Full-frame oracle with vertex-color shading (the reference's live
    scene semantics, App.swift:140-185)."""
    screen = oracle_vertex_stage(positions, transform, width, height)
    tris = np.asarray(tris)
    colors_tri = np.asarray(colors, np.float32)[tris]  # [T, 3, 3]
    return oracle_rasterize(screen, tris, colors_tri, width, height)
