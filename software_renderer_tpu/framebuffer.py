"""Framebuffer: color + depth images and pixel-format conversion.

TPU-native counterpart of the reference's ``Image<Pixel>``/``ColorImage``/
``DepthImage`` layer (reference: renderer/Renderer.swift:5-49 and the
buffer-backed textures in renderer/App.swift:43-70).

Where the reference aliases one shared-memory buffer as both an
``MTLBuffer`` and an ``MTLTexture``, here a framebuffer is simply a pair of
device arrays living in HBM:

* color — float32 RGBA in [0, 1], shape ``[H, W, 4]`` (kept in float on
  device; quantized to 8-bit only at the edge, like the reference's
  ``Pixel.floats`` clamp-and-scale at Renderer.swift:116-124)
* depth — float32, shape ``[H, W]``, cleared to ``+inf``
  (reference contract: Renderer.swift:206, Shaders.metal:33-37)

The reference stores bytes in BGRA order (``Pixel`` field order b,g,r,a at
Renderer.swift:44-49, bgra8Unorm texture at App.swift:62); we keep channel
order RGBA internally and provide both ``to_rgba8`` and ``to_bgra8``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

# Clear values — the reference clears color to transparent black and depth to
# +inf (Renderer.swift:205-206; GpuRenderer.swift:74-78 + Shaders.metal:33-37).
CLEAR_COLOR = (0.0, 0.0, 0.0, 0.0)
CLEAR_DEPTH = jnp.inf
# Sentinel triangle id for "no triangle covers this pixel" in the
# visibility buffer (no reference analogue; the reference simply never
# writes such pixels).
NO_TRIANGLE = jnp.int32(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Framebuffer:
    """Color + depth target. A pytree; safe to pass through jit/vmap."""

    color: jax.Array  # [H, W, 4] float32 RGBA in [0,1]
    depth: jax.Array  # [H, W] float32

    @property
    def height(self) -> int:
        return self.color.shape[-3]

    @property
    def width(self) -> int:
        return self.color.shape[-2]


def create_framebuffer(width: int, height: int, dtype=jnp.float32) -> Framebuffer:
    """Allocate a cleared framebuffer (transparent black, +inf depth)."""
    color = jnp.broadcast_to(
        jnp.asarray(CLEAR_COLOR, dtype=dtype), (height, width, 4)
    )
    depth = jnp.full((height, width), CLEAR_DEPTH, dtype=dtype)
    return Framebuffer(color=color, depth=depth)


def clear(fb: Framebuffer,
          color: Tuple[float, float, float, float] = CLEAR_COLOR,
          depth: float = CLEAR_DEPTH) -> Framebuffer:
    """Clear color and depth (Renderer.swift:205-206, 232-236)."""
    return Framebuffer(
        color=jnp.broadcast_to(
            jnp.asarray(color, dtype=fb.color.dtype), fb.color.shape
        ),
        depth=jnp.full_like(fb.depth, depth),
    )


def quantize_unorm8(x: jax.Array) -> jax.Array:
    """float in [0,1] -> uint8, round-to-nearest.

    This is the GPU contract (Metal unorm texture writes round); the
    reference CPU path truncates instead (Swift ``UInt8(f)`` at
    Renderer.swift:117-123). We standardize on rounding — the two differ by
    at most 1 LSB and the GPU path is the reference's active backend
    (App.swift:154).
    """
    x = jnp.clip(x, 0.0, 1.0) * 255.0
    return jnp.round(x).astype(jnp.uint8)


def to_rgba8(color: jax.Array) -> jax.Array:
    """[..., 4] float RGBA -> uint8 RGBA."""
    return quantize_unorm8(color)


def to_bgra8(color: jax.Array) -> jax.Array:
    """[..., 4] float RGBA -> uint8 BGRA (reference ``Pixel`` byte order,
    Renderer.swift:44-49)."""
    return quantize_unorm8(color[..., jnp.array([2, 1, 0, 3])])


def from_rgba8(img: jax.Array) -> jax.Array:
    """uint8 RGBA -> float RGBA in [0,1]."""
    return img.astype(jnp.float32) / 255.0
