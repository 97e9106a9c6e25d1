"""Vertex stage: batched MVP transform, perspective divide, NDC->pixel.

TPU-native counterpart of the reference's per-vertex loop
(``Vertex.apply(transform:)`` + ``convertedToScreen`` at
renderer/Renderer.swift:159-171) and the ``vertex_pass`` Metal kernel
(renderer/Shaders.metal:57-75): one batched matmul over all vertices
instead of N scalar 4x4 multiplies.

Semantics contract (must match the reference exactly; golden-tested):
* ``clip = M @ [x, y, z, 1]``; ``ndc = clip.xyz / clip.w``
  (Renderer.swift:159-163, Shaders.metal:66-68)
* ``uv = ndc.xy * (0.5, -0.5) + 0.5`` — NDC y-up to pixel y-down
  (Renderer.swift:166, Shaders.metal:70)
* ``pix = round(uv * (W, H))`` with round-half-away-from-zero
  (Swift ``.toNearestOrAwayFromZero`` at Renderer.swift:168; Metal
  ``round`` at Shaders.metal:71). jnp.round is round-half-even, so we use
  sign-aware ``sign(x) * floor(|x| + 0.5)``, which matches away-from-zero
  on both sides of zero — off-screen vertices of partially visible
  triangles still determine on-screen coverage, so negative coordinates
  must round exactly the same way as the reference's.
* z is carried through unchanged (NDC z in [0, 1]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_half_away(x):
    """Round half away from zero (see module docstring)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def transform_vertices(positions, transform):
    """Apply a 4x4 transform with perspective divide.

    Args:
      positions: [N, 3] float32 model-space positions.
      transform: [4, 4] MVP matrix (column-vector convention).

    Returns:
      ndc: [N, 3] NDC positions (xyz / w).
      w:   [N] clip-space w (useful for clipping / perspective-correct
           extensions; the reference discards it after the divide).
    """
    m = transform.astype(jnp.float32)
    # clip = positions @ M[:, :3]^T + M[:, 3] — one fused matmul on the MXU.
    # Precision must be full f32: screen coordinates feed exact edge
    # functions (ops/setup.py), and the TPU's default bf16 matmul precision
    # would shift pixels by several units at 1080p.
    clip = jnp.dot(positions, m[:, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + m[:, 3]
    w = clip[:, 3]
    ndc = clip[:, :3] / w[:, None]
    return ndc, w


def ndc_to_screen(ndc, width, height):
    """NDC -> screen-space (pixel coordinates + NDC z).

    Returns [N, 3] where xy are *rounded* pixel coordinates (the reference
    rounds the vertex positions themselves before rasterizing —
    Renderer.swift:168, Shaders.metal:71) and z is the NDC depth.
    """
    uv = ndc[:, :2] * jnp.array([0.5, -0.5], jnp.float32) + 0.5
    pix = round_half_away(uv * jnp.array([width, height], jnp.float32))
    return jnp.concatenate([pix, ndc[:, 2:3]], axis=-1)


def vertex_stage(positions, transform, width, height):
    """Full vertex pass: model space -> screen space.

    Mirrors Shaders.metal:57-75 as a single batched computation.

    Returns:
      screen: [N, 3] (pixel x, pixel y, ndc z)
      w:      [N] clip-space w
    """
    ndc, w = transform_vertices(positions, transform)
    return ndc_to_screen(ndc, width, height), w


def corner_stage(corners, transform, width, height):
    """Vertex pass over per-triangle corners [T, 3, 3].

    Same math as :func:`vertex_stage` applied to pre-gathered triangle
    corners. The corner gather ``positions[tris]`` is transform-invariant,
    so doing it in *model* space lets XLA hoist it out of per-frame loops
    (and out of the jit entirely when cached at scene build) — the
    screen-space gather it replaces cost ~4 ms/frame at 100k triangles.

    Returns (screen [T, 3, 3], w [T, 3]).
    """
    t = corners.shape[0]
    flat = corners.reshape(t * 3, 3)
    screen, w = vertex_stage(flat, transform, width, height)
    return screen.reshape(t, 3, 3), w.reshape(t, 3)
