"""Anti-aliasing by supersampling (SSAA).

The reference carries a disabled multisample scaffold — ``aa()`` with
``multisampleCount = 1`` (renderer/Renderer.swift:316-331, 426-441) that
would average an NxN in-triangle coverage grid per edge pixel. The
TPU-native equivalent that actually works: render the whole frame at NxN
resolution (every stage is resolution-parametric) and box-filter down.
Uniform, correct at triangle interiors *and* intersections, and it
vectorizes perfectly — no per-edge-pixel special casing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..framebuffer import Framebuffer
from ..render import RenderPass, render


def downsample_box(color, factor: int):
    """[H*f, W*f, C] -> [H, W, C] box filter."""
    h, w, c = color.shape
    color = color.reshape(h // factor, factor, w // factor, factor, c)
    return color.mean(axis=(1, 3))


def render_msaa(rp: RenderPass, samples: int = 2,
                backend: str = "auto") -> Framebuffer:
    """Render with samples x samples supersampling.

    Depth is min-reduced over the sample block (the closest surface under
    the pixel footprint); color is box-filtered.
    """
    if samples == 1:
        return render(rp, backend=backend)
    hi = dataclasses.replace(rp, width=rp.width * samples,
                             height=rp.height * samples)
    fb = render(hi, backend=backend)
    color = downsample_box(fb.color, samples)
    h, w = fb.depth.shape
    depth = fb.depth.reshape(h // samples, samples, w // samples,
                             samples).min(axis=(1, 3))
    return Framebuffer(color=color, depth=depth)
