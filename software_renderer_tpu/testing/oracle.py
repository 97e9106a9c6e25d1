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
    """Shaders.metal:57-75 in float32 numpy.

    The matrix-vector product is evaluated as explicit per-component
    multiply-add chains (m[i,0]*x + m[i,1]*y + m[i,2]*z + m[i,3]) — the
    same association the reference's simd product uses and the same
    expression the planar front-end (ops/frontend.py) evaluates on
    device, so golden coverage comparisons stay exact. (numpy's `@`
    blocks/reorders the f32 summation and differs from the chain by ulps,
    which can flip a rounded pixel coordinate at a .5 boundary.)
    """
    positions = np.asarray(positions, np.float32)
    m = np.asarray(transform, np.float32)
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    clip = np.stack(
        [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3]
         for i in range(4)], axis=-1).astype(np.float32)
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


def oracle_clip_near(positions_tri, transform, width, height,
                     eps=np.float32(1e-6)):
    """Near-plane clip oracle, mirroring ops/clip.py op-for-op in float32.

    positions_tri: [T, 3, 3] model-space triangle corners.
    Returns (screen [K, 3, 3] clipped screen-space corners, bary [K, 3, 3],
    src [K] source-triangle indices) for the K valid output triangles — plain Sutherland-Hodgman per
    triangle (vertex order v0,v1,v2 with prev starting at v2, the same
    walk the LUT in ops/clip.py encodes, so the fan triangulation emits
    triangles in the same corner order), projected and rounded with the
    standard vertex-stage formula.
    """
    m = np.asarray(transform, np.float32)
    out_screen, out_bary, out_src = [], [], []
    eye = np.eye(3, dtype=np.float32)
    for t, tri in enumerate(np.asarray(positions_tri, np.float32)):
        clip = tri @ m[:, :3].T + m[:, 3]  # [3, 4]
        w = clip[:, 3]
        poly = []  # (clip_pos, bary) pairs
        for i in range(3):
            prev, cur = (i - 1) % 3, i
            pin, cin = bool(w[prev] >= eps), bool(w[cur] >= eps)
            if cin != pin:
                s = np.float32((eps - w[prev]) / (w[cur] - w[prev]))
                p = clip[prev] + s * (clip[cur] - clip[prev])
                b = eye[prev] + s * (eye[cur] - eye[prev])
                poly.append((p.astype(np.float32), b.astype(np.float32)))
            if cin:
                poly.append((clip[cur], eye[cur]))
        for k in range(1, len(poly) - 1):  # fan triangulation
            tri_clip = np.stack([poly[0][0], poly[k][0], poly[k + 1][0]])
            tri_bary = np.stack([poly[0][1], poly[k][1], poly[k + 1][1]])
            wv = tri_clip[:, 3]
            ndc = (tri_clip[:, :3].T / wv).T.astype(np.float32)
            uv = (ndc[:, :2] * np.array([0.5, -0.5], np.float32)
                  + np.float32(0.5))
            scaled = uv * np.array([width, height], np.float32)
            pix = np.sign(scaled) * np.floor(np.abs(scaled) + np.float32(0.5))
            out_screen.append(np.concatenate([pix, ndc[:, 2:3]],
                                             axis=-1).astype(np.float32))
            out_bary.append(tri_bary)
            out_src.append(t)
    if not out_screen:
        return (np.zeros((0, 3, 3), np.float32),
                np.zeros((0, 3, 3), np.float32),
                np.zeros((0,), np.int64))
    return np.stack(out_screen), np.stack(out_bary), np.asarray(out_src)


def oracle_render(positions, tris, colors, transform, width, height):
    """Full-frame oracle with vertex-color shading (the reference's live
    scene semantics, App.swift:140-185)."""
    screen = oracle_vertex_stage(positions, transform, width, height)
    tris = np.asarray(tris)
    colors_tri = np.asarray(colors, np.float32)[tris]  # [T, 3, 3]
    return oracle_rasterize(screen, tris, colors_tri, width, height)
