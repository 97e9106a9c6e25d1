"""Reference visibility pass in plain vectorized XLA (the golden model).

Functional counterpart of the reference's two rasterizers — the CPU
scanline loop (renderer/Renderer.swift:238-287) and the Metal
``rasterizer_pass`` (renderer/Shaders.metal:123-167) — expressed as a
data-parallel reduction instead of per-pixel loops: every (pixel, triangle)
pair is tested, and the per-pixel winner is the minimum-depth covering
triangle, with ties broken toward the lower triangle index. That tie-break
reproduces the reference's sequential strict less-than z-test
(Shaders.metal:161: a later triangle replaces an earlier one only when
strictly closer; encoder order serializes triangles, GpuRenderer.swift:117).

O(W*H*T) — intentionally simple and obviously correct. This is the test
oracle for the Pallas tile-binned kernel and the backend used for small
scenes; it scans over triangle chunks so peak memory stays bounded.

Output is a *visibility buffer*: per-pixel depth and triangle id. Color is
produced by the shared deferred resolve stage (ops/resolve.py), exactly
once per pixel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..framebuffer import NO_TRIANGLE
from .setup import TriangleSetup


def pixel_centers(width, height, y_start=0, dtype=jnp.float32):
    """Pixel-center sampling grid: (x + 0.5, y + 0.5) — Shaders.metal:133,
    Renderer.swift:252. ``y_start`` (may be traced) offsets the rows into
    global frame coordinates, so a row-sharded render computes *bitwise*
    the same values as the full frame (parallel/sharding.py)."""
    xs = jnp.arange(width, dtype=dtype) + 0.5
    ys = (jnp.arange(height, dtype=dtype) + jnp.asarray(y_start, dtype)
          + 0.5)
    return xs[None, :], ys[:, None]  # broadcastable [1,W], [H,1]


@partial(jax.jit, static_argnames=("width", "height", "chunk"))
def visibility_ref(setup: TriangleSetup, *, width: int, height: int,
                   y_start=0, chunk: int = 8):
    """Brute-force visibility buffer.

    Returns:
      depth: [H, W] float32 — +inf where uncovered (clear contract of
        Renderer.swift:206 / Shaders.metal:33-37).
      tri_id: [H, W] int32 — NO_TRIANGLE (-1) where uncovered.
    """
    t = setup.num_triangles
    pad = (-t) % chunk
    coef = jnp.pad(setup.coef, ((0, pad), (0, 0), (0, 0)))
    # Padded triangles: e = 0 everywhere would read "inside"; poison the
    # constant term so they never cover.
    if pad:
        coef = coef.at[t:, 2, :].set(-1.0)
    zplane = jnp.pad(setup.zplane, ((0, pad), (0, 0)),
                     constant_values=jnp.inf)
    abs_d = jnp.pad(jnp.abs(setup.area2), (0, pad))
    # Empty pad bbox (x0 = 1 > x1 = 0) — pads never cover anyway (e < 0).
    bbox = jnp.pad(setup.bbox.astype(jnp.float32), ((0, pad), (0, 0)))

    xs, ys = pixel_centers(width, height, y_start)
    n_chunks = coef.shape[0] // chunk
    coef_c = coef.reshape(n_chunks, chunk, 3, 3)
    zplane_c = zplane.reshape(n_chunks, chunk, 3)
    absd_c = abs_d.reshape(n_chunks, chunk)
    bbox_c = bbox.reshape(n_chunks, chunk, 4)

    def body(carry, inputs):
        zbuf, idbuf, base = carry
        c, zp, ad, bb = inputs  # [chunk,3,3], [chunk,3], [chunk], [chunk,4]
        # e0/e1 for all pixels and the chunk's triangles [H, W, chunk];
        # e2 = |D| - e0 - e1 — the SAME derived form the Pallas kernels
        # use and the algebra of the oracle's w2 = 1 - w0 - w1
        # (Shaders.metal:152), not an independent third plane.
        e0 = (xs[..., None] * c[:, 0, 0] + ys[..., None] * c[:, 1, 0]
              + c[:, 2, 0])
        e1 = (xs[..., None] * c[:, 0, 1] + ys[..., None] * c[:, 1, 1]
              + c[:, 2, 1])
        e2 = ad - e0 - e1
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)  # [H, W, chunk]
        # Coverage contract: clamped to the integer bbox (the oracle's /
        # Metal's bbox-loop semantics, Shaders.metal:130-134) — for
        # numerically unsafe slivers (ops/setup.py coverage_safe) the
        # rounding-shifted edges may pass the e-test beyond the bbox.
        inside &= ((xs[..., None] >= bb[:, 0]) & (xs[..., None] <= bb[:, 2] + 1.0)
                   & (ys[..., None] >= bb[:, 1]) & (ys[..., None] <= bb[:, 3] + 1.0))
        depth = (xs[..., None] * zp[:, 0] + ys[..., None] * zp[:, 1]
                 + zp[:, 2])
        cand = jnp.where(inside, depth, jnp.inf)
        # First minimum wins within the chunk (argmin returns first index).
        k = jnp.argmin(cand, axis=-1)
        best = jnp.take_along_axis(cand, k[..., None], axis=-1)[..., 0]
        # Strict less-than across chunks keeps the earlier triangle on ties.
        better = best < zbuf
        zbuf = jnp.where(better, best, zbuf)
        idbuf = jnp.where(better, base + k.astype(jnp.int32), idbuf)
        return (zbuf, idbuf, base + chunk), None

    zbuf0 = jnp.full((height, width), jnp.inf, jnp.float32)
    idbuf0 = jnp.full((height, width), NO_TRIANGLE, jnp.int32)
    (zbuf, idbuf, _), _ = jax.lax.scan(
        body, (zbuf0, idbuf0, jnp.int32(0)), (coef_c, zplane_c, absd_c,
                                              bbox_c)
    )
    return zbuf, idbuf
