"""Multi-device execution: frame-parallel x row-parallel shard_map.

The reference is strictly single-device (SURVEY.md §2 checklist). The
TPU-native scaling story for a rasterizer:

* **frames axis (dp analogue)** — independent frames are embarrassingly
  parallel: shard the batch of per-frame transforms, replicate the scene.
* **rows axis (sp/tp analogue)** — a single frame splits by screen rows:
  every device rasterizes all triangles into its own row slice (an exact
  viewport shift, render.py:render_rows), producing the framebuffer
  already sharded across devices. No communication inside a frame.
* Collectives appear only in the *training* step (texture/appearance
  optimization): gradients are ``psum``-ed over the mesh, the one place
  data crosses ICI.

``dryrun_multichip`` in __graft_entry__.py runs this on a virtual CPU mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..framebuffer import Framebuffer
from ..ops.texture import Texture
from ..render import RenderPass, render_rows


def make_mesh(n_frames: int, n_rows: int, devices=None) -> Mesh:
    """A (frames, rows) device mesh. frames*rows must equal #devices."""
    devices = jax.devices() if devices is None else devices
    assert n_frames * n_rows == len(devices), (
        f"mesh {n_frames}x{n_rows} != {len(devices)} devices")
    import numpy as np
    return Mesh(np.asarray(devices).reshape(n_frames, n_rows),
                ("frames", "rows"))


def _local_render(rp: RenderPass, transforms_local, rows_per_shard: int,
                  backend: str, n_row_shards: int = 1,
                  shard_frontend: bool = False):
    """Render this shard's frames' row slice. Runs inside shard_map.

    Frames iterate via ``lax.scan``, NOT ``vmap``: vmapping a Pallas call
    adds a batch grid dimension, which defeats Mosaic's same-block revisit
    DMA elision in the banded fused kernel — measured 8.5x slower per
    frame at 1080p (docs/PERF.md round 3). Scan pipelines frames on the
    device exactly like the single-chip batch path
    (parallel/batch.py render_batch_chunked(vmap_chunk=1)).

    ``shard_frontend``: split the per-triangle front-end (vertex
    transform + setup, ops/frontend.py planar_front) across the ``rows``
    axis and ``all_gather`` the [T]-column results, instead of every
    shard recomputing the whole FE. The FE is the row-count-INDEPENDENT
    part of a shard's work (~1.9 ms/frame at 100k tris on v5e,
    tools/microbench_planar_split.py), while the gathered columns are
    only ~9 MB — recompute-vs-communicate favors the all_gather on ICI
    by an order of magnitude. Values are unchanged: each triangle's
    columns are computed by exactly one shard with the same math
    (through the Pallas FE kernel the per-block codegen is shape-
    independent, so the columns are bit-equal to the unsharded FE's;
    via the XLA FE at small T they can differ by per-shape FMA-
    contraction ulps — the documented cross-shape tolerance class,
    tests/test_parallel.py)."""
    y0 = jax.lax.axis_index("rows") * rows_per_shard

    front_of = None
    if (shard_frontend and n_row_shards > 1 and not rp.clip_near
            and rp.primitive == "triangle"):
        from ..ops import frontend as fe
        corners = rp.mesh.positions[rp.mesh.triangles()]   # [T, 3, 3]
        t = corners.shape[0]
        tloc = -(-t // n_row_shards)
        # Zero padding is degenerate (d == 0) -> valid=False everywhere.
        corners = jnp.pad(corners.astype(jnp.float32),
                          ((0, tloc * n_row_shards - t), (0, 0), (0, 0)))
        ridx = jax.lax.axis_index("rows")
        local = jax.lax.dynamic_slice_in_dim(corners, ridx * tloc, tloc, 0)
        cols = fe.corner_cols(local)

        def front_of(transform):
            ps_loc = fe.planar_front(cols, transform, rp.width, rp.height,
                                     cull_backfaces=rp.cull_backfaces)
            return jax.tree.map(
                lambda x: jax.lax.all_gather(x, "rows", axis=0, tiled=True),
                ps_loc)

    def one(_, t):
        fb = render_rows(dataclasses.replace(rp, transform=t),
                         y_start=y0, rows=rows_per_shard, backend=backend,
                         front=front_of(t) if front_of is not None else None)
        return None, (fb.color, fb.depth)

    _, (color, depth) = jax.lax.scan(one, None, transforms_local)
    return color, depth


def render_sharded(rp: RenderPass, transforms, mesh: Mesh,
                   backend: str = "auto",
                   shard_frontend: bool = True) -> Framebuffer:
    """Render [B] frames over a (frames, rows) mesh.

    transforms: [B, 4, 4], B divisible by mesh 'frames'; rp.height
    divisible by mesh 'rows'. Returns a Framebuffer whose color/depth are
    globally [B, H, W, 4]/[B, H, W], sharded over (frames, rows).

    shard_frontend (default on): split the per-triangle front-end over
    the 'rows' axis and all_gather the columns instead of recomputing it
    per shard — see _local_render. Ignored for clip_near scenes.
    """
    n_rows = mesh.shape["rows"]
    assert rp.height % n_rows == 0, "height must divide over the rows axis"
    rows_per = rp.height // n_rows

    fn = shard_map(
        partial(_local_render, rp, rows_per_shard=rows_per, backend=backend,
                n_row_shards=n_rows, shard_frontend=shard_frontend),
        mesh=mesh,
        in_specs=(P("frames"),),
        out_specs=(P("frames", "rows"), P("frames", "rows")),
        check_vma=False,
    )
    color, depth = jax.jit(fn)(jnp.asarray(transforms, jnp.float32))
    return Framebuffer(color=color, depth=depth)


# ---------------------------------------------------------------------------
# Appearance-optimization training step (the framework's "training" story):
# fit texture texels so rendered frames match target images. Demonstrates
# autodiff through resolve/shading and the dp-style psum of gradients.
# ---------------------------------------------------------------------------

def texture_train_step(tex_data, rp: RenderPass, transforms, targets,
                       mesh: Mesh, lr: float = 0.5,
                       backend: str = "auto"):
    """One SGD step on texture texels over a (frames, rows) mesh.

    Args:
      tex_data: [Th, Tw, 3] float32 texels (replicated).
      rp: scene with shading='textured'.
      transforms: [B, 4, 4] sharded over 'frames'.
      targets: [B, H, W, 4] target frames, sharded over (frames, rows).

    Returns (new_tex_data, loss). Gradients are psum-ed across the whole
    mesh — the only collective in the framework's hot loops.

    backend: 'auto' (default) differentiates through the PRODUCTION fused
    pipeline — texture gradients flow through finish_fused's gather (the
    fused kernel's geometry outputs are stop_gradient'ed, which is fine
    here: the loss is a function of texels only). Vertex-attribute or
    light optimization needs backend='reference'/'pallas'.
    """
    n_rows = mesh.shape["rows"]
    rows_per = rp.height // n_rows
    b_global = transforms.shape[0]

    def shard_fn(tex, transforms_local, targets_local):
        def loss_fn(tex):
            rp_tex = dataclasses.replace(rp, texture=Texture(data=tex))
            color, _ = _local_render(rp_tex, transforms_local, rows_per,
                                     backend, n_row_shards=n_rows,
                                     shard_frontend=True)
            # Local sum of squared error; global mean via psum.
            err = color - targets_local
            return jnp.sum(err * err)

        loss, grad = jax.value_and_grad(loss_fn)(tex)
        denom = b_global * rp.height * rp.width * 4
        loss = jax.lax.psum(loss, ("frames", "rows")) / denom
        grad = jax.lax.psum(grad, ("frames", "rows")) / denom
        return tex - lr * grad, loss

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("frames"), P("frames", "rows")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(tex_data, jnp.asarray(transforms, jnp.float32),
                       targets)
