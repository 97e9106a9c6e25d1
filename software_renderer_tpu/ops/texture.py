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
    """An RGB(A) texture. data: [Th, Tw, C] float32 in [0, 1].

    table_dtype: storage dtype of the bilinear quad table. float32 is the
    measured optimum on v5e: the 2M-row frame gather is row-issue-bound
    with 2D indices (~7 ms at 1080p), and a float16 table LOSES ~2.8 ms —
    the narrow-minor [H, W, 12] f16->f32 conversion after the gather is a
    padded relayout that costs more than the halved row bytes save.
    """

    data: jax.Array
    filter: str = dataclasses.field(default="bilinear",
                                    metadata=dict(static=True))
    wrap: str = dataclasses.field(default="repeat",
                                  metadata=dict(static=True))
    table_dtype: str = dataclasses.field(default="float32",
                                         metadata=dict(static=True))


def _wrap_coords(i, n, mode):
    if mode == "repeat":
        return jnp.mod(i, n)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown wrap mode {mode!r}")


def _quad_table(tex: Texture):
    """[Th*Tw, 4C] table where row (y, x) holds the 2x2 texel neighborhood
    [t(y,x), t(y,x+1), t(y+1,x), t(y+1,x+1)] with the wrap mode baked in.

    Bilinear sampling then needs ONE row gather per pixel instead of four
    scattered texel gathers — a 4x reduction in gather count, which is
    what TPU gather throughput is proportional to. Built in O(texels) on
    device; XLA CSEs it across pixels within a jit.
    """
    d = tex.data
    if tex.wrap == "repeat":
        dx = jnp.roll(d, -1, axis=1)
        dy = jnp.roll(d, -1, axis=0)
        dxy = jnp.roll(dx, -1, axis=0)
    else:  # clamp: shift with edge duplication
        dx = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
        dy = jnp.concatenate([d[1:], d[-1:]], axis=0)
        dxy = jnp.concatenate([dx[1:], dx[-1:]], axis=0)
    th, tw, c = d.shape
    quad = jnp.concatenate([d, dx, dy, dxy], axis=-1)  # [Th, Tw, 4C]
    return quad.reshape(th * tw, 4 * c).astype(tex.table_dtype)


def sample_texture_planes(tex: Texture, u, v):
    """Planar bilinear sample: u, v are separate [...] arrays; returns a
    list of C [...] planes.

    Identical math to :func:`sample_texture`, but every intermediate is a
    full-lane-width 2D array — no [..., 2]/[..., 4C] narrow-minor-dim
    tensors, which on TPU tile the last dimension up to 128 lanes and turn
    each elementwise op into a padded relayout. The quad gather stays one
    row gather per pixel.
    """
    th, tw = tex.data.shape[0], tex.data.shape[1]
    c = tex.data.shape[2]
    u = u * tw
    v = v * th
    if tex.filter == "nearest":
        xi = _wrap_coords(jnp.floor(u).astype(jnp.int32), tw, tex.wrap)
        yi = _wrap_coords(jnp.floor(v).astype(jnp.int32), th, tex.wrap)
        flat = tex.data.reshape(th * tw, c)
        texel = flat[yi * tw + xi]  # [..., C]
        return [texel[..., i] for i in range(c)]
    if tex.filter != "bilinear":
        raise ValueError(f"unknown filter {tex.filter!r}")
    x = u - 0.5
    y = v - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xa = _wrap_coords(x0.astype(jnp.int32), tw, tex.wrap)
    ya = _wrap_coords(y0.astype(jnp.int32), th, tex.wrap)
    quad = _quad_table(tex)[ya * tw + xa].astype(jnp.float32)  # one gather
    out = []
    for i in range(c):
        t00 = quad[..., i]
        t01 = quad[..., c + i]
        t10 = quad[..., 2 * c + i]
        t11 = quad[..., 3 * c + i]
        top = t00 + (t01 - t00) * fx
        bot = t10 + (t11 - t10) * fx
        out.append(top + (bot - top) * fy)
    return out


def sample_texture(tex: Texture, uv):
    """Sample at uv in [0,1]^2 (u right, v down). uv: [..., 2].

    Returns [..., C] float32.
    """
    th, tw = tex.data.shape[0], tex.data.shape[1]
    c = tex.data.shape[2]
    u = uv[..., 0] * tw
    v = uv[..., 1] * th
    if tex.filter == "nearest":
        xi = _wrap_coords(jnp.floor(u).astype(jnp.int32), tw, tex.wrap)
        yi = _wrap_coords(jnp.floor(v).astype(jnp.int32), th, tex.wrap)
        flat = tex.data.reshape(th * tw, c)
        return flat[yi * tw + xi]
    if tex.filter != "bilinear":
        raise ValueError(f"unknown filter {tex.filter!r}")
    # Bilinear: sample positions at texel centers; one quad-row gather.
    x = u - 0.5
    y = v - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xa = _wrap_coords(x0.astype(jnp.int32), tw, tex.wrap)
    ya = _wrap_coords(y0.astype(jnp.int32), th, tex.wrap)
    quad = _quad_table(tex)[ya * tw + xa].astype(jnp.float32)  # [..., 4C]
    t00 = quad[..., 0:c]
    t01 = quad[..., c:2 * c]
    t10 = quad[..., 2 * c:3 * c]
    t11 = quad[..., 3 * c:4 * c]
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
