"""Texture sampling: nearest and bilinear, clamp/repeat addressing.

The reference loads UVs from its mesh but never samples a texture
(App.swift:129-133 — SURVEY.md component 17 notes UVs are dropped); texture
support is part of the driver-assigned north star (BASELINE.json configs
2/4). Implemented as batched gathers over the whole frame — XLA lowers
these to vectorized dynamic-gathers that fuse with the resolve pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Texture:
    """An RGB(A) texture. data: [Th, Tw, C] float32 in [0, 1]."""

    data: jax.Array
    filter: str = dataclasses.field(default="bilinear",
                                    metadata=dict(static=True))
    wrap: str = dataclasses.field(default="repeat",
                                  metadata=dict(static=True))


def _wrap_coords(i, n, mode):
    if mode == "repeat":
        return jnp.mod(i, n)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown wrap mode {mode!r}")


def sample_texture(tex: Texture, uv):
    """Sample at uv in [0,1]^2 (u right, v down). uv: [..., 2].

    Returns [..., C] float32.
    """
    th, tw = tex.data.shape[0], tex.data.shape[1]
    u = uv[..., 0] * tw
    v = uv[..., 1] * th
    if tex.filter == "nearest":
        xi = _wrap_coords(jnp.floor(u).astype(jnp.int32), tw, tex.wrap)
        yi = _wrap_coords(jnp.floor(v).astype(jnp.int32), th, tex.wrap)
        return tex.data[yi, xi]
    if tex.filter != "bilinear":
        raise ValueError(f"unknown filter {tex.filter!r}")
    # Bilinear: sample positions at texel centers.
    x = u - 0.5
    y = v - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xa = _wrap_coords(x0i, tw, tex.wrap)
    xb = _wrap_coords(x0i + 1, tw, tex.wrap)
    ya = _wrap_coords(y0i, th, tex.wrap)
    yb = _wrap_coords(y0i + 1, th, tex.wrap)
    t00 = tex.data[ya, xa]
    t01 = tex.data[ya, xb]
    t10 = tex.data[yb, xa]
    t11 = tex.data[yb, xb]
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def checkerboard(size: int = 256, tiles: int = 8,
                 c0=(1.0, 1.0, 1.0), c1=(0.2, 0.2, 0.2)) -> Texture:
    """Procedural checkerboard (test/demo texture)."""
    ij = jnp.arange(size) * tiles // size
    mask = (ij[:, None] + ij[None, :]) % 2
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    data = jnp.where(mask[..., None] == 0, c0, c1)
    return Texture(data=data)
