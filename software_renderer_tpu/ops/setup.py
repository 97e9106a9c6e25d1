"""Triangle setup: edge-function coefficients, depth plane, bbox, culling.

This stage has no direct analogue in the reference — it is the TPU-native
replacement for work the reference re-does per pixel. The Metal
``rasterizer_pass`` (renderer/Shaders.metal:136-153) evaluates normalized
barycentric weights from raw vertex positions for every pixel; here we
factor that math into per-triangle *affine edge coefficients* once, so the
hot rasterization kernel does three fused multiply-adds and three compares
per pixel per triangle.

Numerics are chosen for exactness. With the reference's rounded integer
vertex coordinates (Renderer.swift:168 / Shaders.metal:71), the
*unnormalized* edge functions

    e0 = (y2-y3)(x-x3) + (x3-x2)(y-y3)
    e1 = (y3-y1)(x-x3) + (x1-x3)(y-y3)
    e2 = D - e0 - e1,   D = (x1-x3)(y2-y3) - (x2-x3)(y1-y3)

are exactly representable in float32 at all supported resolutions
(coordinates <= 4096 keep every product under 2^24), so the coverage
decision ``inside = all(0 <= e_i/D <= 1)`` (Shaders.metal:153) is made with
*zero rounding error* — bitwise identical to the reference's sign
decisions. We fold ``sign(D)`` into the coefficients so the in-kernel test
is simply ``all(e_i >= 0)`` (with sum(e_i) = |D| the upper bound is
implied). Normalized quantities (barycentric weights for attribute
interpolation, the screen-space depth plane of Shaders.metal:157) divide by
|D| once per triangle here, not once per pixel in the kernel.

The exactness premise breaks for triangles with FAR-OFFSCREEN vertices
(products past 2^24 round) — for a near-degenerate sliver the rounded
edge constants can then pass the inside test PIXELS beyond the true
triangle, even outside the integer bbox (the perturbed edge lines'
intersections move by ~err/sin(angle)). The coverage CONTRACT is the
oracle's (and Metal's) bbox-clamped semantics, so :func:`coverage_safe`
computes a conservative per-triangle certificate "perturbed coverage
provably stays inside the bbox"; unsafe triangles (adversarial slivers —
real scenes virtually never produce them, see the bound) are routed to
the bbox-clamping overflow kernels by ops/binning.py, keeping the hot
fused walk free of per-record bbox tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleSetup:
    """Per-triangle rasterization data (all leading dim [T])."""

    coef: jax.Array       # [T, 3, 3] sign-folded unnormalized edges:
                          #   e_j = coef[t, 0, j]*x + coef[t, 1, j]*y + coef[t, 2, j]
                          #   inside  <=>  all_j e_j >= 0
    zplane: jax.Array     # [T, 3] — depth = zp[0]*x + zp[1]*y + zp[2]
    inv_area: jax.Array   # [T] — 1/|D|; barycentric w_j = e_j * inv_area
    bbox: jax.Array       # [T, 4] int32 — x0, y0, x1, y1 inclusive, clamped
    valid: jax.Array      # [T] bool — rasterize this triangle at all
    area2: jax.Array      # [T] float32 — 2x signed area D (screen space)
    safe: jax.Array       # [T] bool — coverage provably inside bbox
                          #   (:func:`coverage_safe`); False routes the
                          #   triangle to the bbox-clamping overflow path

    @property
    def num_triangles(self) -> int:
        return self.coef.shape[0]


# coverage_safe thresholds. EXACT_LIMIT: when every edge chain's partial
# magnitudes stay below it, all products/sums are integers (or
# half-integers at pixel centers) exactly representable in f32 — the
# coverage math has ZERO rounding error and coverage is contained in the
# rounded-corner hull, hence the bbox. ERR_SCALE: 8x the f32 epsilon,
# slack for the <= 4-term chains when past the exact window.
# SAFE_MARGIN: maximum tolerated perturbation of the covered region in
# pixels; pixel centers outside the bbox are >= 0.5 px from the hull, so
# 0.25 certifies with 2x margin.
EXACT_LIMIT = 2.0 ** 21
ERR_SCALE = 2.0 ** -20
SAFE_MARGIN = 0.25


def coverage_safe(x1, y1, x2, y2, x3, y3, a0, b0, a1, b1, abs_d,
                  width, height):
    """Per-triangle certificate: f32 coverage provably inside the bbox.

    The inside test {e0 >= 0, e1 >= 0, |D| - e0 - e1 >= 0} describes the
    triangle bounded by the three (rounded) edge lines. Each constant
    c_j and each in-kernel evaluation carries at most ``err_j`` of
    absolute rounding error (0 in the exact-integer window); an edge line
    therefore shifts by at most ``err_j / ||grad_j||`` pixels, and an
    edge-line INTERSECTION (a vertex of the covered region) moves by at
    most ``(err_i ||g_j|| + err_j ||g_i||) / |cross(g_i, g_j)|`` with
    ``|cross| = |D|`` — the sliver amplification. Coverage stays inside
    the bbox when both stay under SAFE_MARGIN (< the 0.5 px gap between
    the hull and the nearest out-of-bbox pixel center).

    All args are [T] columns of ROUNDED screen coords / sign-folded edge
    gradients. Returns [T] bool (False for non-finite inputs).
    """
    import numpy as np

    wf = np.float32(width)
    hf = np.float32(height)
    one = np.float32(1.0)
    tiny = np.float32(1e-30)
    ax = jnp.maximum(jnp.abs(x3), wf) + one
    ay = jnp.maximum(jnp.abs(y3), hf) + one
    m0 = jnp.abs(a0) * ax + jnp.abs(b0) * ay
    m1 = jnp.abs(a1) * ax + jnp.abs(b1) * ay
    md = (jnp.abs(x1 - x3) * jnp.abs(y2 - y3)
          + jnp.abs(x2 - x3) * jnp.abs(y1 - y3))
    exact = (m0 + m1 + md) < np.float32(EXACT_LIMIT)
    scale = np.float32(ERR_SCALE)
    err0 = jnp.where(exact, 0.0, m0 * scale)
    err1 = jnp.where(exact, 0.0, m1 * scale)
    err2 = err0 + err1 + jnp.where(exact, 0.0, md * scale)
    a2 = a0 + a1  # |a2| (sign-folded -(a0+a1) has the same magnitude)
    b2 = b0 + b1
    g0u = jnp.abs(a0) + jnp.abs(b0)   # >= ||g0||_2 (numerator bound)
    g1u = jnp.abs(a1) + jnp.abs(b1)
    g2u = jnp.abs(a2) + jnp.abs(b2)
    g0l = jnp.maximum(jnp.maximum(jnp.abs(a0), jnp.abs(b0)), tiny)  # <= L2
    g1l = jnp.maximum(jnp.maximum(jnp.abs(a1), jnp.abs(b1)), tiny)
    g2l = jnp.maximum(jnp.maximum(jnp.abs(a2), jnp.abs(b2)), tiny)
    e_shift = jnp.maximum(jnp.maximum(err0 / g0l, err1 / g1l), err2 / g2l)
    dd = jnp.maximum(abs_d, tiny)
    v_shift = jnp.maximum(
        jnp.maximum(err0 * g1u + err1 * g0u, err0 * g2u + err2 * g0u),
        err1 * g2u + err2 * g1u) / dd
    margin = np.float32(SAFE_MARGIN)
    return (e_shift <= margin) & (v_shift <= margin)


def triangle_setup(screen, tris, width, height,
                   cull_backfaces: bool = False,
                   front_face_ccw: bool = True) -> TriangleSetup:
    """Compute per-triangle raster coefficients from indexed vertices.

    Args:
      screen: [N, 3] screen-space vertices (pixel x, pixel y, ndc z).
      tris: [T, 3] int vertex indices.
    See :func:`triangle_setup_from_corners` for the other args.
    """
    return triangle_setup_from_corners(
        screen[tris], width, height, cull_backfaces=cull_backfaces,
        front_face_ccw=front_face_ccw)


def triangle_setup_from_corners(v, width, height,
                                cull_backfaces: bool = False,
                                front_face_ccw: bool = True,
                                extra_valid=None) -> TriangleSetup:
    """Compute per-triangle raster coefficients.

    Args:
      v: [T, 3, 3] screen-space triangle corners (pixel x, pixel y, ndc z)
        — from ops/vertex.py corner_stage (preferred: the corner gather
        stays in model space) or ``screen[tris]``.
      width, height: viewport size in pixels.
      cull_backfaces: drop triangles by winding (off by default — the
        reference renders both faces, e.g. its inward-normal sphere at
        App.swift:124).
      front_face_ccw: model-space winding convention; after the NDC y-flip a
        CCW model triangle has screen D > 0.
      extra_valid: optional [T] bool mask ANDed into validity (near-plane
        cull/clip masks from ops/clip.py, padding slots, ...).
    """
    x1, y1, z1 = v[:, 0, 0], v[:, 0, 1], v[:, 0, 2]
    x2, y2, z2 = v[:, 1, 0], v[:, 1, 1], v[:, 1, 2]
    x3, y3, z3 = v[:, 2, 0], v[:, 2, 1], v[:, 2, 2]

    d = (x1 - x3) * (y2 - y3) - (x2 - x3) * (y1 - y3)  # Shaders.metal:143
    finite = jnp.all(jnp.isfinite(v), axis=(1, 2))
    degenerate = ~finite | (d == 0.0)
    s = jnp.where(d < 0.0, -1.0, 1.0)  # sign fold (degenerate handled below)
    abs_d = jnp.abs(d)
    inv_area = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, abs_d))

    a0 = (y2 - y3) * s
    b0 = (x3 - x2) * s
    a1 = (y3 - y1) * s
    b1 = (x1 - x3) * s
    c0 = -(a0 * x3 + b0 * y3)
    c1 = -(a1 * x3 + b1 * y3)
    a2 = -(a0 + a1)
    b2 = -(b0 + b1)
    c2 = abs_d - c0 - c1

    # coef[t] rows correspond to (x, y, 1); columns to (e0, e1, e2).
    coef = jnp.stack(
        [
            jnp.stack([a0, a1, a2], axis=-1),
            jnp.stack([b0, b1, b2], axis=-1),
            jnp.stack([c0, c1, c2], axis=-1),
        ],
        axis=-2,
    )  # [T, 3, 3]

    # Screen-space-linear depth plane (Shaders.metal:157 interpolates z with
    # the normalized weights): depth = sum_j w_j z_j, w_j = e_j / |D|.
    # Explicit multiply-add chains (VPU, exact f32) in the same
    # association as the planar front-end (ops/frontend.py) — einsum
    # would hit the MXU at bf16 default precision and quantize depth.
    zplane = jnp.stack(
        [(a0 * z1 + a1 * z2 + a2 * z3) * inv_area,
         (b0 * z1 + b1 * z2 + b2 * z3) * inv_area,
         (c0 * z1 + c1 * z2 + c2 * z3) * inv_area], axis=-1)

    # Bounding box in pixel indices, clamped to the viewport. Replaces the
    # reference's roi_pass (Shaders.metal:89-114) without its unsigned-wrap
    # behaviour for negative coords or the host-side "skip if x==0 || y==0"
    # workaround (GpuRenderer.swift:122-124) that drops triangles touching
    # the left/top screen edge.
    xs, ys = v[:, :, 0], v[:, :, 1]
    min_x, max_x = jnp.min(xs, axis=1), jnp.max(xs, axis=1)
    min_y, max_y = jnp.min(ys, axis=1), jnp.max(ys, axis=1)
    offscreen = (max_x < 0.0) | (min_x > width) | (max_y < 0.0) | (min_y > height)
    clean = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
    x0 = jnp.clip(clean(jnp.floor(min_x)), 0, width - 1)
    y0 = jnp.clip(clean(jnp.floor(min_y)), 0, height - 1)
    x1b = jnp.clip(clean(jnp.ceil(max_x)), 0, width - 1)
    y1b = jnp.clip(clean(jnp.ceil(max_y)), 0, height - 1)
    bbox = jnp.stack([x0, y0, x1b, y1b], axis=-1).astype(jnp.int32)

    valid = ~degenerate & ~offscreen
    if extra_valid is not None:
        valid = valid & extra_valid
    if cull_backfaces:
        front = (d > 0.0) if front_face_ccw else (d < 0.0)
        valid = valid & front

    # Invalid triangles must never pass the inside test nor the depth test:
    # force e = (-1, -1, -1) (fails e >= 0) and depth = +inf.
    coef_fill = jnp.zeros_like(coef).at[:, 2, :].set(-1.0)
    coef = jnp.where(valid[:, None, None], coef, coef_fill)
    zplane_fill = jnp.array([0.0, 0.0, jnp.inf], jnp.float32)
    zplane = jnp.where(valid[:, None], zplane, zplane_fill)
    inv_area = jnp.where(valid, inv_area, 0.0)
    safe = coverage_safe(x1, y1, x2, y2, x3, y3, a0, b0, a1, b1, abs_d,
                         width, height)
    return TriangleSetup(coef=coef, zplane=zplane, inv_area=inv_area,
                         bbox=bbox, valid=valid, area2=d,
                         safe=safe | ~valid)
