"""Line and point rasterization.

Covers the reference's non-triangle primitives:
* ``.vertices`` mode — plot each transformed vertex as one pixel
  (Renderer.swift:295-302; truncating float->int conversion, no depth
  test, color written unconditionally when in bounds).
* 2D DDA line (Renderer.swift:405-419) and the 3D wireframe path
  (``draw(line3d:)`` -> DDA, Renderer.swift:372-374, used by the cube demo
  at App.swift:206-282). The reference's ``RenderPass`` ``.line`` mode is
  an empty stub (Renderer.swift:289-293); here it actually draws.

TPU-native formulation: a line of S steps is a *batched scatter* — all
lines emit a fixed S samples (S = max viewport dimension, masked past each
line's true length), then one ``scatter`` writes the frame. No per-pixel
host loops, jit/vmap-safe, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def scatter_points(color_img, xs, ys, colors, mask=None):
    """Write colors at integer pixel coords with bounds masking.

    color_img: [H, W, 4]; xs/ys: [K] int32; colors: [K, 4] or [K, 3].
    Later entries overwrite earlier ones (XLA scatter applies updates in
    order), matching the reference's sequential writes.
    """
    h, w = color_img.shape[:2]
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    if mask is not None:
        inb = inb & mask
    if colors.shape[-1] == 3:
        colors = jnp.concatenate(
            [colors, jnp.ones(colors.shape[:-1] + (1,), colors.dtype)],
            axis=-1)
    # Out-of-bounds/masked entries are redirected to a dummy pixel index
    # then dropped via mode="drop" (index w is out of range on purpose).
    xs = jnp.where(inb, xs, w)
    return color_img.at[ys, xs].set(colors, mode="drop")


def draw_points(color_img, screen, colors):
    """``.vertices`` primitive: plot each screen-space vertex.

    Truncating conversion matches ``Int(v.xyz.x)`` (Renderer.swift:298-299).
    """
    xs = screen[:, 0].astype(jnp.int32)
    ys = screen[:, 1].astype(jnp.int32)
    return scatter_points(color_img, xs, ys, colors)


def draw_lines(color_img, screen, lines, colors, steps: int | None = None):
    """Batched DDA lines.

    Args:
      color_img: [H, W, 4].
      screen: [N, 3] screen-space vertices.
      lines: [L, 2] int vertex indices.
      colors: [N, 3/4] per-vertex colors (interpolated along the line —
        a strict upgrade over the reference's single-color DDA).
      steps: max samples per line; defaults to max(W, H).

    DDA per Renderer.swift:405-419: steps = max(|dx|, |dy|), positions
    rounded to nearest.
    """
    h, w = color_img.shape[:2]
    s = int(steps if steps is not None else max(w, h))
    a = screen[lines[:, 0]]  # [L, 3]
    b = screen[lines[:, 1]]
    if colors.shape[-1] == 3:
        colors = jnp.concatenate(
            [colors, jnp.ones(colors.shape[:-1] + (1,), colors.dtype)],
            axis=-1)
    ca = colors[lines[:, 0]]
    cb = colors[lines[:, 1]]
    d = b[:, :2] - a[:, :2]
    nsteps = jnp.maximum(
        jnp.max(jnp.abs(d), axis=-1), 1.0
    )  # [L] float "pixels along the major axis"
    t = jnp.arange(s, dtype=jnp.float32)[None, :]  # [1, S]
    frac = t / nsteps[:, None]                      # [L, S]
    valid = t < nsteps[:, None]   # reference loops 0..<steps
    px = a[:, None, 0] + d[:, None, 0] * frac
    py = a[:, None, 1] + d[:, None, 1] * frac
    xs = jnp.floor(px + 0.5).astype(jnp.int32).reshape(-1)
    ys = jnp.floor(py + 0.5).astype(jnp.int32).reshape(-1)
    col = ca[:, None, :] + (cb - ca)[:, None, :] * frac[..., None]
    return scatter_points(color_img, xs, ys, col.reshape(-1, 4),
                          mask=valid.reshape(-1))
