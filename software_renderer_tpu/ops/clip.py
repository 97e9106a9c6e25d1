"""Near-plane (w > eps) clipping — static-shape Sutherland-Hodgman.

The reference divides by clip-space w unconditionally (renderer/
Shaders.metal:68, Renderer.swift:159-163): a triangle straddling the eye
plane (w <= 0 at some vertex) projects to garbage that still rasterizes.
This module closes that hole two ways:

* **Cull** (default, free): triangles with ANY vertex at w <= eps are
  marked invalid before setup — no garbage coverage ever reaches the
  rasterizer. Branchless mask; zero cost on scenes fully in front.
* **Clip** (``RenderPass.clip_near=True``): exact geometric clipping
  against the w = eps plane in clip space. Each input triangle yields at
  most 2 output triangles (1 behind -> quad -> 2 tris; 2 behind -> 1 tri;
  0/3 behind -> 1/0), so the output is a static [2T] triangle array —
  slot t holds the (possibly clipped) primary triangle, slot T + t the
  quad's second half. New vertices carry barycentric weights w.r.t. the
  source triangle's corners, so any per-vertex attribute interpolates
  through the clip exactly (linear in clip space along the cut edge).

All math is float32 and mirrored op-for-op by the numpy oracle
(testing/oracle.py oracle_clip_near) so golden tests compare bit-exact
coverage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLIP_EPS = jnp.float32(1e-6)

# Sutherland-Hodgman output quads per behind-mask case (see derivation in
# tests/test_clip.py). Candidate ids: 0,1,2 = original corners; 3 = edge
# (0,1) intersection, 4 = edge (1,2), 5 = edge (2,0). case = b0 + 2*b1 +
# 4*b2. 3-vertex outputs repeat their last vertex (degenerate second tri).
_QUAD_LUT = [
    [0, 1, 2, 2],  # 0: none behind        -> original, tri2 degenerate
    [5, 3, 1, 2],  # 1: v0 behind          -> quad
    [0, 3, 4, 2],  # 2: v1 behind          -> quad
    [5, 4, 2, 2],  # 3: v0,v1 behind       -> single tri
    [5, 0, 1, 4],  # 4: v2 behind          -> quad
    [3, 1, 4, 4],  # 5: v0,v2 behind       -> single tri
    [5, 0, 3, 3],  # 6: v1,v2 behind       -> single tri
    [0, 0, 0, 0],  # 7: all behind         -> culled
]
_TRI2_VALID = [False, True, True, False, True, False, False, False]


def transform_corners_clip(corners, transform):
    """Model-space corners [T, 3, 3] -> clip space [T, 3, 4] (no divide).

    Evaluated as explicit per-component multiply-add chains — the SAME
    association as the planar front-end (ops/frontend.py) and the numpy
    oracle, so the clip path's case-0 (all-in-front pass-through) stays
    bit-equal to the unclipped planar path.
    """
    m = transform.astype(jnp.float32)
    x, y, z = corners[..., 0], corners[..., 1], corners[..., 2]
    return jnp.stack(
        [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3]
         for i in range(4)], axis=-1)


def cull_behind_mask(clip, eps=CLIP_EPS):
    """[T] bool — True where the whole triangle is safely in front
    (all corner w > eps). The default near-plane guard."""
    return jnp.all(clip[:, :, 3] > eps, axis=1)


def clip_near(clip, eps=CLIP_EPS):
    """Clip [T, 3, 4] clip-space triangles against the w = eps plane.

    Returns:
      out_clip: [2T, 3, 4] clipped clip-space corners (slot t = primary,
        slot T + t = the quad's second triangle).
      bary:     [2T, 3, 3] barycentric weights of each output corner
        w.r.t. the source triangle's corners (attribute composition:
        ``attr_out = bary @ attr_src``).
      valid:    [2T] bool.
    """
    t = clip.shape[0]
    w = clip[:, :, 3]
    behind = w < eps  # [T, 3]
    case = (behind[:, 0].astype(jnp.int32)
            + 2 * behind[:, 1].astype(jnp.int32)
            + 4 * behind[:, 2].astype(jnp.int32))

    # The three edge intersections with w = eps (computed unconditionally;
    # unused lanes are selected away). s on edge (a, b):
    #   s = (eps - w_a) / (w_b - w_a);  P = P_a + s * (P_b - P_a)
    def intersect(a, b):
        den = w[:, b] - w[:, a]
        safe = jnp.where(jnp.abs(den) > 0.0, den, 1.0)
        s = (eps - w[:, a]) / safe
        p = clip[:, a] + s[:, None] * (clip[:, b] - clip[:, a])
        e = jnp.zeros((t, 3), jnp.float32)
        e = e.at[:, a].set(1.0 - s).at[:, b].set(s)
        return p, e

    i01_p, i01_b = intersect(0, 1)
    i12_p, i12_b = intersect(1, 2)
    i20_p, i20_b = intersect(2, 0)

    cand_p = jnp.stack(
        [clip[:, 0], clip[:, 1], clip[:, 2], i01_p, i12_p, i20_p], axis=1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (t, 3, 3))
    cand_b = jnp.concatenate(
        [eye, jnp.stack([i01_b, i12_b, i20_b], axis=1)], axis=1)  # [T,6,3]

    lut = jnp.asarray(_QUAD_LUT, jnp.int32)          # [8, 4]
    sel = lut[case]                                   # [T, 4]
    quad_p = jnp.take_along_axis(cand_p, sel[:, :, None], axis=1)  # [T,4,4]
    quad_b = jnp.take_along_axis(cand_b, sel[:, :, None], axis=1)  # [T,4,3]

    tri1_p = quad_p[:, (0, 1, 2)]
    tri2_p = quad_p[:, (0, 2, 3)]
    tri1_b = quad_b[:, (0, 1, 2)]
    tri2_b = quad_b[:, (0, 2, 3)]
    tri1_valid = case != 7
    tri2_valid = jnp.asarray(_TRI2_VALID)[case]

    out_clip = jnp.concatenate([tri1_p, tri2_p], axis=0)
    bary = jnp.concatenate([tri1_b, tri2_b], axis=0)
    valid = jnp.concatenate([tri1_valid, tri2_valid], axis=0)
    return out_clip, bary, valid


def compose_attrs(bary, attrs):
    """Interpolate per-corner attributes through the clip.

    bary: [2T, 3, 3] from clip_near; attrs: [T, 3, A] source-corner
    values. Returns [2T, 3, A].
    """
    attrs2 = jnp.concatenate([attrs, attrs], axis=0)  # [2T, 3, A]
    # out[t, i, a] = sum_j bary[t, i, j] * attrs2[t, j, a] — tiny per-
    # triangle contraction; explicit multiply-sum stays f32 on the VPU.
    return jnp.sum(bary[:, :, :, None] * attrs2[:, None, :, :], axis=2)
