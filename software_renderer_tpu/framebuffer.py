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


# ---------------------------------------------------------------------------
# Pixel-format registry — the analogue of the reference's MTLPixelFormat
# metadata tables (Metal+Extensions.swift:511-595: bytes-per-pixel +
# channel-count switches). Each entry: (bytes_per_pixel, channels,
# encode_fn, decode_fn); encode takes [..., 4] float RGBA, decode returns
# [..., 4] float RGBA (missing channels fill g=b=0 / a=1, matching Metal's
# texture swizzle defaults).
# ---------------------------------------------------------------------------

def _encode_rgb565(color):
    q = jnp.clip(color[..., :3], 0.0, 1.0)
    r = jnp.round(q[..., 0] * 31.0).astype(jnp.uint16)
    g = jnp.round(q[..., 1] * 63.0).astype(jnp.uint16)
    b = jnp.round(q[..., 2] * 31.0).astype(jnp.uint16)
    return (r << 11) | (g << 5) | b


def _decode_rgb565(raw):
    raw = raw.astype(jnp.uint16)
    r = ((raw >> 11) & 0x1F).astype(jnp.float32) / 31.0
    g = ((raw >> 5) & 0x3F).astype(jnp.float32) / 63.0
    b = (raw & 0x1F).astype(jnp.float32) / 31.0
    return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)


# Rec.601 luma (the common gray conversion; the reference has no gray
# format — extension for completeness).
_LUMA = (0.299, 0.587, 0.114)


def _encode_gray8(color):
    w = jnp.asarray(_LUMA, jnp.float32)
    return quantize_unorm8(jnp.sum(color[..., :3] * w, axis=-1))


def _decode_gray8(raw):
    y = raw.astype(jnp.float32) / 255.0
    return jnp.stack([y, y, y, jnp.ones_like(y)], axis=-1)


PIXEL_FORMATS = {
    # name: (bytes_per_pixel, channels, encode, decode)
    "rgba8": (4, 4, to_rgba8,
              lambda raw: from_rgba8(raw)),
    "bgra8": (4, 4, to_bgra8,
              lambda raw: from_rgba8(raw[..., jnp.array([2, 1, 0, 3])])),
    "rgb565": (2, 3, _encode_rgb565, _decode_rgb565),
    "gray8": (1, 1, _encode_gray8, _decode_gray8),
    "rgba16f": (8, 4,
                lambda c: c.astype(jnp.float16),
                lambda raw: raw.astype(jnp.float32)),
    "rgba32f": (16, 4, lambda c: c.astype(jnp.float32), lambda raw: raw),
    # Depth-style single-channel float (r32Float at App.swift:67-69).
    "r32f": (4, 1,
             lambda c: c[..., 0].astype(jnp.float32),
             lambda raw: jnp.stack([raw, raw, raw, jnp.ones_like(raw)],
                                   axis=-1)),
}


def encode_pixels(color: jax.Array, fmt: str) -> jax.Array:
    """[..., 4] float RGBA -> packed pixels in the named format."""
    try:
        codec = PIXEL_FORMATS[fmt][2]
    except KeyError:
        raise ValueError(f"unknown pixel format {fmt!r}; "
                         f"have {sorted(PIXEL_FORMATS)}") from None
    return codec(color)


def decode_pixels(raw: jax.Array, fmt: str) -> jax.Array:
    """Packed pixels -> [..., 4] float RGBA (missing channels defaulted)."""
    try:
        codec = PIXEL_FORMATS[fmt][3]
    except KeyError:
        raise ValueError(f"unknown pixel format {fmt!r}; "
                         f"have {sorted(PIXEL_FORMATS)}") from None
    return codec(raw)


def bytes_per_pixel(fmt: str) -> int:
    """Format stride (Metal+Extensions.swift:511-538 analogue)."""
    return PIXEL_FORMATS[fmt][0]
