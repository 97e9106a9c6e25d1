"""2D drawing routines: rect, circle, line, 2D triangle.

Counterparts of the reference's direct-to-framebuffer 2D rasterizers
(renderer/Renderer.swift:376-465) and its 2D ``Triangle`` barycentric type
(Renderer.swift:76-108). The reference loops pixels on the CPU; here each
primitive is a vectorized mask/field over the frame (or a scatter for
lines), composable under jit/vmap.

Fidelity notes (SURVEY.md component 13):
* ``draw(rect:)`` in the reference iterates y by rect.w and x by rect.h —
  a swapped-bounds bug; we implement the evident intent (fill w x h).
* ``draw(circle:)`` ignores its color argument and always writes blue with
  a smoothstep-AA rim (Renderer.swift:385-403); we honor the color and
  keep the same smoothstep(r+2, r-2) edge profile.
* The 2D triangle fills with the RGB-basis barycentric gradient and has an
  unused multisample AA scaffold (multisampleCount=1, Renderer.swift:
  421-465); ours interpolates three arbitrary corner colors and real MSAA
  lives in ops/msaa.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lines import draw_lines as _draw_lines_screen


def _pixel_grid(h, w):
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    return xs, ys


def _blend(img, mask, rgba):
    """mask [H, W] in [0,1]; rgba broadcastable to [H, W, 4]."""
    m = mask[..., None]
    return img * (1.0 - m) + rgba * m


def draw_rect(img, x, y, w, h, color):
    """Filled axis-aligned rect. color: [3] or [4]."""
    xs, ys = _pixel_grid(img.shape[0], img.shape[1])
    mask = ((xs >= x) & (xs < x + w) & (ys >= y) & (ys < y + h)
            ).astype(img.dtype)
    return _blend(img, mask, _rgba(color, img.dtype))


def draw_circle(img, cx, cy, r, color):
    """Filled circle with the reference's smoothstep rim: opaque inside
    r-2, smoothstep falloff between r-2 and r+2 (Renderer.swift:393-397)."""
    xs, ys = _pixel_grid(img.shape[0], img.shape[1])
    d = jnp.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
    # smoothstep(r+2, r-2, d): 1 inside, 0 outside, smooth in between.
    t = jnp.clip((d - (r + 2.0)) / ((r - 2.0) - (r + 2.0)), 0.0, 1.0)
    cov = t * t * (3.0 - 2.0 * t)
    return _blend(img, cov.astype(img.dtype), _rgba(color, img.dtype))


def draw_line(img, x0, y0, x1, y1, color):
    """DDA line (Renderer.swift:405-419): steps = max(|dx|, |dy|),
    rounded positions, single color."""
    screen = jnp.array([[x0, y0, 0.0], [x1, y1, 0.0]], jnp.float32)
    lines = jnp.array([[0, 1]], jnp.int32)
    colors = jnp.broadcast_to(_rgba(color, jnp.float32), (2, 4))
    return _draw_lines_screen(img, screen, lines, colors)


def draw_triangle2d(img, a, b, c, colors=((1, 0, 0), (0, 1, 0), (0, 0, 1))):
    """Filled 2D triangle with barycentric-interpolated corner colors.

    Default corner colors are the RGB basis, matching the reference's
    hardcoded gradient (Renderer.swift:445-449). Inside test and weights
    evaluated at pixel centers exactly like the 3D path.
    """
    h, w = img.shape[:2]
    xs, ys = _pixel_grid(h, w)
    ax, ay = jnp.float32(a[0]), jnp.float32(a[1])
    bx, by = jnp.float32(b[0]), jnp.float32(b[1])
    cx, cy = jnp.float32(c[0]), jnp.float32(c[1])
    d = (ax - cx) * (by - cy) - (bx - cx) * (ay - cy)
    s = jnp.where(d < 0, -1.0, 1.0)
    e0 = ((by - cy) * (xs - cx) + (cx - bx) * (ys - cy)) * s
    e1 = ((cy - ay) * (xs - cx) + (ax - cx) * (ys - cy)) * s
    e2 = jnp.abs(d) - e0 - e1
    inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (d != 0)
    inv = jnp.where(d == 0, 0.0, 1.0 / jnp.abs(jnp.where(d == 0, 1.0, d)))
    w0, w1, w2 = e0 * inv, e1 * inv, e2 * inv
    cols = jnp.asarray(colors, jnp.float32)
    rgb = (w0[..., None] * cols[0] + w1[..., None] * cols[1]
           + w2[..., None] * cols[2])
    rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
    return jnp.where(inside[..., None], rgba.astype(img.dtype), img)


def _rgba(color, dtype):
    c = jnp.asarray(color, dtype)
    if c.shape[-1] == 3:
        c = jnp.concatenate([c, jnp.ones_like(c[..., :1])], axis=-1)
    return c
