"""RenderPass — the framework's central API — and the render orchestrator.

Mirrors the reference's ``RenderPass`` (renderer/Renderer.swift:191-200):
mesh + indices + primitive type + a single 4x4 transform in, framebuffer
out. Extended per the north star with shading modes, lights, textures, and
culling — all the knobs the reference hardcodes (SURVEY.md §5 config list).

Two interchangeable backends consume the same RenderPass, exactly like the
reference's CPU ``Renderer`` / ``GpuRenderer`` pair (App.swift:154 flips
them):

* ``reference`` — brute-force vectorized XLA (ops/rasterize_ref.py), the
  always-correct golden model (analogue of Renderer.swift's CPU path).
* ``pallas``    — tile-based Pallas visibility kernel (ops/rasterize_pallas
  .py), the production path (analogue of GpuRenderer + Shaders.metal).

Both produce a visibility buffer consumed by the shared deferred resolve;
the whole frame is one jit-compiled XLA computation with zero host
round-trips (unlike the reference's two mid-frame ``scheduleAndWait``
blocks + per-primitive CPU dispatch loop, GpuRenderer.swift:73-138).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .framebuffer import Framebuffer, CLEAR_COLOR
from .models.mesh import Mesh
from .ops import lines as lines_ops
from .ops import frontend as fe
from .ops.clip import (clip_near as clip_near_plane, compose_attrs,
                       transform_corners_clip)
from .ops.rasterize_ref import visibility_ref
from .ops.setup import (triangle_setup, triangle_setup_from_corners,
                        TriangleSetup)
from .ops.shading import Light, gather_attribute_values, shade
from .ops.texture import Texture
from .ops.vertex import ndc_to_screen, vertex_stage


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderPass:
    """One draw: scene state in, framebuffer out (Renderer.swift:191-200).

    Dynamic leaves (traced): mesh, transform, light, texture, flat_color.
    Static fields (compile-time): sizes, modes, flags.
    """

    mesh: Mesh
    transform: jax.Array  # [4, 4] MVP (column-vector convention)

    width: int = dataclasses.field(default=512, metadata=dict(static=True))
    height: int = dataclasses.field(default=512, metadata=dict(static=True))
    primitive: str = dataclasses.field(default="triangle",
                                       metadata=dict(static=True))
    shading: str = dataclasses.field(default="vertex",
                                     metadata=dict(static=True))
    cull_backfaces: bool = dataclasses.field(default=False,
                                             metadata=dict(static=True))

    # Perspective-correct attribute interpolation (extension; the
    # reference interpolates screen-space linear — Shaders.metal:157,162).
    # All backends: the fused binned path carries attr/w + 1/w planes and
    # divides in the kernel epilogue; 'reference'/'pallas' correct the
    # barycentric weights in the XLA resolve.
    perspective_correct: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    # Near-plane handling. The reference divides by clip-w blindly
    # (Shaders.metal:68) and rasterizes garbage for triangles straddling
    # the eye plane; by default we *cull* any triangle with a vertex at
    # w <= eps (free, branchless). clip_near=True instead clips exactly
    # against the near plane (ops/clip.py: 1 triangle -> up to 2, a static
    # [2T] array, attributes interpolated through the cut).
    clip_near: bool = dataclasses.field(default=False,
                                        metadata=dict(static=True))

    light: Optional[Light] = None
    texture: Optional[Texture] = None
    flat_color: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.ones((3,), jnp.float32))
    # Optional model matrix used only to rotate normals into lighting space
    # for Phong (the reference has a single fused MVP and no lighting).
    model: Optional[jax.Array] = None


# 'auto' routes to the binned backend at any size: its fused Pallas
# resolve+shade beats the unbinned kernel + XLA gather resolve even for a
# 12-triangle cube (1.6 ms vs 9.7 ms at 512^2 on v5e — the per-pixel
# coefficient/attribute gathers dominate, not the raster loop; huge
# triangles ride the overflow waves). Pick backend='pallas'/'reference'
# explicitly for vertex-attribute/light gradients (the fused kernel is
# appearance-differentiable through the texture gather only) or as the
# golden cross-check.
AUTO_BIN_THRESHOLD = 0


_FUSED_GRAD_MSG = (
    "render(backend='auto'/'binned') is being differentiated w.r.t. "
    "geometry/vertex-attribute/light inputs, but the fused pipeline stops "
    "those gradients (they are returned as ZERO). Only texture gradients "
    "flow on the fast path; use backend='pallas' or 'reference' for "
    "vertex-attribute/light gradients.")


def _stop_geometry_grads(fn, *inputs):
    """Run ``fn(*inputs)`` with the inputs' gradients STOPPED — and warn.

    The fused Pallas pipeline has no AD rule, so its geometry inputs
    (triangle setup, attribute planes, shading params) must be isolated
    from autodiff. A bare ``stop_gradient`` downstream is not enough:
    under ``jax.grad`` the linearizer still pushes tangents INTO the
    pallas_call (crashing with an internal assertion), and a user
    differentiating geometry through default ``render`` would otherwise
    get silent zeros (round-2 advisor finding). ``custom_vjp`` solves
    both: reverse-mode AD never enters ``fn``, and the ``bwd`` rule is
    traced ONLY when AD actually requests cotangents for these inputs —
    i.e. exactly when the user differentiates geometry, not during
    texture-only optimization (whose gradient flows through
    finish_fused's gather, outside this region). The rule warns at trace
    time and returns zeros. Forward-mode (jvp) over geometry raises
    JAX's standard custom_vjp error, which names this function.
    """
    import warnings

    import numpy as np

    wrapped = jax.custom_vjp(fn)

    def _fwd(*args):
        return fn(*args), args

    def _zero_ct(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    def _bwd(args, _ct):
        warnings.warn(_FUSED_GRAD_MSG, stacklevel=2)
        return tuple(jax.tree_util.tree_map(_zero_ct, a) for a in args)

    wrapped.defvjp(_fwd, _bwd)
    return wrapped(*inputs)


def _visibility(setup: TriangleSetup, rp: RenderPass, backend: str,
                y_start=0):
    if backend == "auto":
        backend = ("binned" if setup.num_triangles >= AUTO_BIN_THRESHOLD
                   else "pallas")
    if backend == "reference":
        return visibility_ref(setup, width=rp.width, height=rp.height,
                              y_start=y_start)
    if backend == "pallas":
        from .ops.rasterize_pallas import visibility_pallas
        return visibility_pallas(setup, width=rp.width, height=rp.height,
                                 y_start=y_start)
    if backend == "binned":
        from .ops.binning import visibility_binned
        return visibility_binned(setup, width=rp.width, height=rp.height,
                                 y_start=y_start)
    raise ValueError(f"unknown backend {backend!r}")


def render_triangles(rp: RenderPass, backend: str,
                     y_start=None, rows: Optional[int] = None,
                     front=None) -> Framebuffer:
    """Render the triangle path; optionally only rows [y_start, y_start+rows).

    ``front``: an optional precomputed :class:`ops.frontend.PlanarSetup`
    (possibly zero-padded past the mesh's triangle count — padding is
    degenerate, hence invalid). Row-sharded rendering uses this to split
    the per-triangle front-end across the ``rows`` mesh axis and
    ``all_gather`` the columns instead of replicating the whole FE per
    shard (parallel/sharding.py). Requires ``clip_near=False`` (the clip
    path is corner-structured, not planar).

    Row slicing keeps *global* frame coordinates throughout — triangle
    setup is computed against the full viewport and the rasterizer's pixel
    centers are offset by ``y_start`` — so a row-sharded render makes
    exactly the same coverage decisions as the full frame (the edge
    functions are exact; see ops/setup.py). Depth values can differ by
    codegen ulps (XLA fuses the depth-plane FMA differently per shape),
    which can flip depth *ties* along shared triangle edges — the same
    tolerance class as the reference's own CPU-vs-GPU backend pair. That is
    how multi-device row sharding composes (parallel/sharding.py): zero
    cross-device communication, zero boundary artifacts beyond tie ulps.
    """
    mesh = rp.mesh
    out_h = rp.height if rows is None else rows
    y0 = 0 if y_start is None else y_start
    tris = mesh.triangles()
    # Corner gather in model space (transform-invariant: XLA hoists it out
    # of frame loops). The default path runs the PLANAR front-end
    # (ops/frontend.py): every per-triangle quantity stays a separate [T]
    # column — the array [T, 3(, 3)] form pads its minor dim to 128 TPU
    # lanes and measured 3.6 ms/frame at 1080p/100k vs 2.2 planar. All
    # backends consume the same front-end values (to_setup re-packs them),
    # so cross-backend coverage stays bit-equal. The near-plane-CLIP path
    # keeps the array front-end: clipping rewrites corners in clip space
    # (1 triangle -> up to 2), which is inherently corner-structured.
    corners = mesh.positions[tris]
    if front is not None and rp.clip_near:
        raise ValueError("a precomputed front requires clip_near=False")
    if rp.clip_near:
        # Exact near-plane clip: [T] -> [2T] triangles; new corners carry
        # barycentric weights for attribute composition below.
        clip_c = transform_corners_clip(corners, rp.transform)
        clip_c, cbary, cvalid = clip_near_plane(clip_c)
        w_c = clip_c[:, :, 3]
        ndc = clip_c[:, :, :3] / jnp.where(w_c == 0.0, 1.0, w_c)[:, :, None]
        t_out = ndc.shape[0]
        screen_c = ndc_to_screen(ndc.reshape(t_out * 3, 3), rp.width,
                                 rp.height).reshape(t_out, 3, 3)
        setup = triangle_setup_from_corners(
            screen_c, rp.width, rp.height,
            cull_backfaces=rp.cull_backfaces, extra_valid=cvalid)
        ps = None
    else:
        cbary = None
        ps = front if front is not None else fe.planar_front(
            fe.corner_cols(corners), rp.transform, rp.width, rp.height,
            cull_backfaces=rp.cull_backfaces)
        setup = None   # materialized lazily for the non-binned backends
        w_c = None     # ditto (fe.corner_w)

    def get_setup():
        nonlocal setup
        if setup is None:
            setup = fe.to_setup(ps)
        return setup

    def get_w_c():
        nonlocal w_c
        if w_c is None:
            w_c = fe.corner_w(ps)
        return w_c

    if backend == "auto":
        backend = ("binned"
                   if (ps if ps is not None else setup).num_triangles
                   >= AUTO_BIN_THRESHOLD else "pallas")
    rp = dataclasses.replace(rp, height=out_h)
    normal_matrix = None
    if rp.model is not None:
        from .ops.transforms import inverse_transpose_3x3
        normal_matrix = inverse_transpose_3x3(rp.model[:3, :3])

    def clipped_corner_attrs():
        """(attrs, chans) for shade() when the triangle list is the clipped
        [2T] array (shade's own gather would index the unclipped mesh)."""
        if not rp.clip_near:
            return None
        a0, c0 = gather_attribute_values(
            rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
            uvs=mesh.uvs,
            has_light=rp.light is not None and mesh.normals is not None)
        if a0 is None:
            return None
        return (compose_attrs(cbary, a0), c0)

    if backend == "binned":
        # Fast path: binned visibility + fused Pallas resolve-and-shade
        # (plane evaluation + Blinn-Phong inside the kernel; only the
        # texture gather + final combine stay in XLA).
        from functools import partial as _partial

        from .ops.binning import binned_pipeline, fused_pipeline

        # Culled scenes emit ~half the pairs; a smaller static stream
        # capacity shrinks the kernel grid and the dead-slot walk (spills
        # past the budget still render via the overflow waves). The band-
        # partitioned layout (ops/binning.py FUSED_BANDS) emits one pair
        # per (tile, band) — ~1.3-1.5x more pairs for the same scene, so
        # its budget is scaled up; both points swept on v5e (docs/PERF.md
        # round 3, step 15).
        from .ops.binning import FUSED_BANDS
        if FUSED_BANDS > 1:
            # No-cull 3.0 (not 2.0): the config3 teapot's banded pairs
            # pass 2.0x from t ~ 2 s and spilled 15/21 bench samples —
            # the per-frame seeded overflow waves cost 4.5x, while the
            # larger static stream is noise at small T (measured, PERF.md
            # round 3).
            budget = 0.85 if rp.cull_backfaces else 3.0
            if os.environ.get("SR_PAIR_BUDGET"):
                # Measurement override (budget sweeps must cover the FULL
                # bench animation — a low budget that looks fast on the
                # cheap frames spills 4.5x on the expensive ones).
                budget = float(os.environ["SR_PAIR_BUDGET"])
        else:
            budget = 0.75 if rp.cull_backfaces else 1.5
        from .ops.shading import (
            attribute_channels, finish_fused, fused_epilogue,
            fused_output_channels, shade_gbuffer, shading_params)

        has_light = rp.light is not None and mesh.normals is not None
        if ps is not None:
            # Planar attributes: per-corner [T] columns gathered in model
            # space (transform-invariant — hoisted out of frame loops);
            # normals rotate per frame as 9 FMA chains (gather/rotate
            # commute exactly, so values match the array path's
            # rotate-then-gather).
            chans = attribute_channels(rp.shading, mesh.colors is not None,
                                       has_light)
            attrs = []
            for name, _ in chans:
                if name == "rgb":
                    attrs += fe.attr_corner_cols(mesh.colors[tris])
                elif name == "uv":
                    attrs += fe.attr_corner_cols(mesh.uvs[tris])
                elif name == "normal":
                    nx, ny, nz = fe.attr_corner_cols(mesh.normals[tris])
                    if normal_matrix is not None:
                        nm = normal_matrix
                        rot = lambda i: tuple(
                            nm[i, 0] * nx[c] + nm[i, 1] * ny[c]
                            + nm[i, 2] * nz[c] for c in range(3))
                        nx, ny, nz = rot(0), rot(1), rot(2)
                    attrs += [nx, ny, nz]
            if front is not None and attrs:
                # A precomputed (sharded-FE) front may be padded past the
                # mesh's T to divide over the mesh axis; pad the attribute
                # columns to match (padding is invalid -> never resolved).
                tpad = ps.num_triangles - tris.shape[0]
                if tpad > 0:
                    attrs = [tuple(jnp.pad(col, (0, tpad)) for col in tri3)
                             for tri3 in attrs]
            attrs = attrs or None
            pipe_setup = ps
        else:
            # Array front-end (near-plane-clipped [2T] corner list): bake
            # the normal matrix into the per-vertex normals (linear, so
            # it commutes with plane interpolation).
            normals = mesh.normals
            if normals is not None and normal_matrix is not None:
                normals = normals @ normal_matrix.T
            attrs, chans = gather_attribute_values(
                rp.shading, tris, colors=mesh.colors, normals=normals,
                uvs=mesh.uvs, has_light=has_light)
            if attrs is not None:
                attrs = compose_attrs(cbary, attrs)
            pipe_setup = setup
        if attrs is None:
            def _vis_only(setup_in, y0_in):
                d, i, _ = binned_pipeline(
                    setup_in, None, width=rp.width, height=out_h,
                    y_start=y0_in, pair_budget_factor=budget)
                return d, i
            # Geometry gradients stop HERE (with a trace-time warning if
            # AD requests them) — see _stop_geometry_grads.
            depth, tri_id = _stop_geometry_grads(_vis_only, get_setup(), y0)
            color = shade_gbuffer(None, tri_id != -1, shading=rp.shading,
                                  chans=chans, light=rp.light,
                                  texture=rp.texture,
                                  flat_color=rp.flat_color)
            return Framebuffer(color=color, depth=depth)
        has_texture = rp.shading == "textured"
        out_chans = fused_output_channels(rp.shading, chans, has_light,
                                          has_texture)
        n_out = sum(s for _, s in out_chans)
        params = shading_params(rp.light, flat_color=rp.flat_color)
        epilogue = _partial(fused_epilogue, chans=chans,
                            has_light=has_light, has_texture=has_texture)
        if rp.perspective_correct:
            # Perspective-correct on the fast path: interpolate the
            # affine attr/w planes plus a 1/w plane and divide in the
            # kernel epilogue (ops/shading.py perspective_epilogue) — no
            # XLA gather fallback.
            from .ops.shading import (perspective_epilogue,
                                      perspective_vertex_attrs)
            if ps is not None:
                attrs = fe.perspective_chan_vals(attrs, ps)
            else:
                attrs = perspective_vertex_attrs(attrs, w_c)
            epilogue = _partial(perspective_epilogue, inner=epilogue)
        def _fused(setup_in, attrs_in, params_in, y0_in):
            return fused_pipeline(
                setup_in, attrs_in, params_in, width=rp.width, height=out_h,
                epilogue=epilogue, n_out=n_out, y_start=y0_in,
                pair_budget_factor=budget)

        # The fused kernel has no AD rule; geometry/vertex-attr/light
        # gradients stop HERE (with a trace-time warning if AD requests
        # them — _stop_geometry_grads). Appearance gradients (texture)
        # flow through finish_fused's gather below.
        depth, tri_id, out = _stop_geometry_grads(
            _fused, pipe_setup, attrs, params, y0)
        color = finish_fused(out, tri_id != -1, out_chans=out_chans,
                             light=rp.light, texture=rp.texture)
        return Framebuffer(color=color, depth=depth)

    depth, tri_id = _visibility(get_setup(), rp, backend, y_start=y0)
    # The visibility buffer is discrete (winner ids + hard z-test): gradients
    # flow through resolve/shading (appearance: colors, textures, lights),
    # not through coverage. Geometry gradients need a soft-coverage mode.
    depth = jax.lax.stop_gradient(depth)
    tri_id = jax.lax.stop_gradient(tri_id)
    color = shade(
        get_setup(), tri_id, tris,
        shading=rp.shading,
        colors=mesh.colors, normals=mesh.normals, uvs=mesh.uvs,
        light=rp.light, texture=rp.texture,
        flat_color=rp.flat_color, normal_matrix=normal_matrix,
        y_start=y0,
        w_tri=get_w_c() if rp.perspective_correct else None,
        corner_attrs=clipped_corner_attrs(),
    )
    return Framebuffer(color=color, depth=depth)


def render_lines(rp: RenderPass) -> Framebuffer:
    mesh = rp.mesh
    screen, _ = vertex_stage(mesh.positions, rp.transform, rp.width,
                             rp.height)
    color = jnp.broadcast_to(
        jnp.asarray(CLEAR_COLOR, jnp.float32), (rp.height, rp.width, 4))
    colors = mesh.colors if mesh.colors is not None else jnp.ones(
        (mesh.num_vertices, 3), jnp.float32)
    color = lines_ops.draw_lines(color, screen, mesh.lines(), colors)
    depth = jnp.full((rp.height, rp.width), jnp.inf, jnp.float32)
    return Framebuffer(color=color, depth=depth)


def render_points(rp: RenderPass) -> Framebuffer:
    mesh = rp.mesh
    screen, _ = vertex_stage(mesh.positions, rp.transform, rp.width,
                             rp.height)
    color = jnp.broadcast_to(
        jnp.asarray(CLEAR_COLOR, jnp.float32), (rp.height, rp.width, 4))
    colors = mesh.colors if mesh.colors is not None else jnp.ones(
        (mesh.num_vertices, 3), jnp.float32)
    idx = mesh.indices
    color = lines_ops.draw_points(color, screen[idx], colors[idx])
    depth = jnp.full((rp.height, rp.width), jnp.inf, jnp.float32)
    return Framebuffer(color=color, depth=depth)


def render_rows(rp: RenderPass, y_start, rows: int,
                backend: str = "auto", front=None) -> Framebuffer:
    """Render only rows [y_start, y_start + rows) of the frame with global
    semantics (the row-sharding building block). ``y_start`` may be traced
    (e.g. derived from ``jax.lax.axis_index`` inside shard_map).
    ``front``: optional precomputed PlanarSetup (see render_triangles)."""
    if rp.primitive != "triangle":
        raise NotImplementedError("row slicing applies to the triangle path")
    return render_triangles(rp, backend, y_start=y_start, rows=rows,
                            front=front)


@partial(jax.jit, static_argnames=("backend",), inline=True)
def render(rp: RenderPass, backend: str = "auto") -> Framebuffer:
    """Render one frame. Fully jit-compiled; vmappable over rp leaves.

    Dispatch by primitive type mirrors Renderer.swift:210-219.

    ``backend='auto'`` (default) routes triangles to the binned fused
    pipeline — the fast path at every scene size (see AUTO_BIN_THRESHOLD).
    Pass ``'pallas'`` or ``'reference'`` explicitly for geometry /
    vertex-attribute gradients (the fused kernel stops coverage gradients)
    or as the golden cross-check.

    ``inline=True``: when ``render`` is called inside an outer jit (the
    steady-state frame loop — bench.py's scan, FrameLoop), the frame graph
    inlines into the caller instead of lowering as a nested call, so XLA
    fuses the tail with the caller's consumers (measured ~5 ms/frame at
    1080p: the call boundary blocked fusion and forced materialized
    layouts).
    """
    if rp.primitive == "triangle":
        return render_triangles(rp, backend)
    if rp.primitive == "line":
        return render_lines(rp)
    if rp.primitive in ("point", "vertices"):
        return render_points(rp)
    raise ValueError(f"unknown primitive {rp.primitive!r}")
