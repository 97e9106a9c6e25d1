"""Image resize utilities — the reference's present-scale layer.

The reference resizes two ways: MPS bilinear filtering between textures
(renderer/Metal+Extensions.swift:464-495) and nearest-neighbor drawable
upscaling at present time (App.swift:31-36, the 512x512 framebuffer shown
in a 1024x1024 window). TPU-native equivalents:

* ``resize_bilinear`` — separable: a [H', H] row-interpolation matrix and
  a [W, W'] column matrix, applied as two matmuls. Interpolation weight
  matrices are tiny, XLA fuses the pair, and the contraction runs on the
  MXU (f32 HIGHEST: weights are exact dyadic-ish fractions, images are
  unorm — well within exactness bounds).
* ``resize_nearest`` — one gather per axis (``jnp.take``), matching the
  reference's nearest-filter present path exactly.

Both operate on [H, W, C] (or [H, W]) arrays of any float dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_matrix(n_in: int, n_out: int) -> jax.Array:
    """[n_out, n_in] row-interpolation matrix with half-pixel centers
    (align_corners=False, the MPS/GL convention)."""
    pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    pos = jnp.clip(pos, 0.0, n_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_in - 1)
    t = pos - lo.astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, lo].add(1.0 - t)
    m = m.at[rows, hi].add(t)
    return m


def resize_bilinear(image, height: int, width: int):
    """Bilinear resize to [height, width] (up or down)."""
    img = jnp.asarray(image, jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    mh = _bilinear_matrix(h, height)          # [H', H]
    mw = _bilinear_matrix(w, width).T         # [W, W']
    out = jnp.einsum("oh,hwc,wp->opc", mh, img, mw,
                     precision=jax.lax.Precision.HIGHEST)
    return out[..., 0] if squeeze else out


def resize_nearest(image, height: int, width: int):
    """Nearest-neighbor resize (the App.swift:31-36 present filter)."""
    img = jnp.asarray(image)
    h, w = img.shape[:2]
    ys = ((jnp.arange(height, dtype=jnp.float32) + 0.5) * (h / height)
          ).astype(jnp.int32)
    xs = ((jnp.arange(width, dtype=jnp.float32) + 0.5) * (w / width)
          ).astype(jnp.int32)
    return jnp.take(jnp.take(img, jnp.clip(ys, 0, h - 1), axis=0),
                    jnp.clip(xs, 0, w - 1), axis=1)
