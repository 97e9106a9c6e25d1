"""Frame batching: vmap the whole frame function.

BASELINE.json config 5: "Batched render: vmap over 64 animated frames".
The reference renders one frame per vsync on one device (App.swift:75-107);
here the entire pipeline — vertex matmul, setup, Pallas visibility kernel,
resolve, shading — is a pure function of the RenderPass pytree, so a batch
of frames is literally ``jax.vmap(render)``. The Pallas kernel batches via
its vmap rule (the batch axis becomes an extra grid dimension).

Single-chip batching bound (measured, docs/PERF.md round 3): a TPU core
executes one HLO at a time, so there is nothing to overlap frame N+1's
bin build with — "batched" rendering on one chip IS scan-pipelining,
which ``render_batch_chunked(vmap_chunk=1)`` does. Wide vmap is actively
harmful at 1080p scale (vmap_chunk=4 measured 8.5x slower/frame: the
batch grid dimension defeats Mosaic's same-block revisit DMA elision in
the binned kernel). Batched throughput *scaling* is the multi-chip story
(parallel/sharding.py shards frames/rows across devices).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..framebuffer import Framebuffer
from ..render import RenderPass, render


@partial(jax.jit, static_argnames=("backend",))
def render_batch(rp: RenderPass, transforms, backend: str = "auto"
                 ) -> Framebuffer:
    """Render B frames of the same scene under B transforms.

    Args:
      rp: scene RenderPass (its ``transform`` is ignored).
      transforms: [B, 4, 4] per-frame MVP matrices.

    Returns a Framebuffer with leading batch dim: color [B, H, W, 4],
    depth [B, H, W].
    """
    def one(t):
        return render(dataclasses.replace(rp, transform=t), backend=backend)

    return jax.vmap(one)(jnp.asarray(transforms, jnp.float32))


def animation_transforms(scene_transform_fn, times):
    """[B] times -> [B, 4, 4] via a time-parametrized transform fn."""
    return jax.vmap(scene_transform_fn)(jnp.asarray(times, jnp.float32))


@partial(jax.jit, static_argnames=("backend", "vmap_chunk"))
def render_batch_chunked(rp: RenderPass, transforms,
                         backend: str = "binned",
                         vmap_chunk: int = 8) -> Framebuffer:
    """Config-5-scale batches with bounded memory: scan over groups of
    ``vmap_chunk`` vmapped frames.

    A flat vmap over 64 frames at 1080p materializes every pipeline
    intermediate 64x (tens of GB); scanning groups keeps peak memory at
    vmap_chunk frames while still amortizing dispatch and letting XLA
    pipeline across frames.
    """
    transforms = jnp.asarray(transforms, jnp.float32)
    b = transforms.shape[0]
    assert b % vmap_chunk == 0, (b, vmap_chunk)
    groups = transforms.reshape(b // vmap_chunk, vmap_chunk, 4, 4)

    def one(t):
        fb = render(dataclasses.replace(rp, transform=t), backend=backend)
        return fb.color, fb.depth

    if vmap_chunk == 1:
        # Scan-pipelined frames without a size-1 vmap: vmapping a Pallas
        # call adds a batch grid dimension, which defeats Mosaic's
        # same-block revisit elision (the binned kernel re-DMAs its tile
        # buffers every step) — measured 2.4x slower per frame at 1080p.
        def group(_, ts):
            c, d = one(ts[0])
            return None, (c[None], d[None])
    else:
        def group(_, ts):
            return None, jax.vmap(one)(ts)

    _, (color, depth) = jax.lax.scan(group, None, groups)
    return Framebuffer(
        color=color.reshape((b,) + color.shape[2:]),
        depth=depth.reshape((b,) + depth.shape[2:]),
    )
