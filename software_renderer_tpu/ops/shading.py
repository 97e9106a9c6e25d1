"""Fragment shading: the pluggable ``fragment_shader`` seam.

The reference's fragment stage is ``float4(vin.color, 1)`` — interpolated
vertex colors, opaque alpha (renderer/Shaders.metal:116-121, and the CPU
path's color interpolation at Renderer.swift:263-268). SURVEY.md calls this
seam out as the extension point; the north star (BASELINE.json) adds Phong
lighting and bilinear texturing, implemented here as whole-frame vectorized
passes over the G-buffer produced by ops/resolve.py.

All modes write alpha = 1 for covered pixels and leave uncovered pixels at
the transparent-black clear color (Renderer.swift:205).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .resolve import barycentrics_at_pixels, interpolate_attribute
from .texture import Texture, sample_texture


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Light:
    """Directional light + Blinn-Phong material response."""

    direction: jax.Array          # [3] direction the light travels (toward scene)
    color: jax.Array              # [3]
    ambient: jax.Array            # [3]
    specular: jax.Array           # [3]
    shininess: jax.Array          # [] float

    @staticmethod
    def default():
        return Light(
            direction=jnp.array([0.3, -0.5, 0.8], jnp.float32),
            color=jnp.array([1.0, 1.0, 1.0], jnp.float32),
            ambient=jnp.array([0.15, 0.15, 0.15], jnp.float32),
            specular=jnp.array([0.5, 0.5, 0.5], jnp.float32),
            shininess=jnp.float32(32.0),
        )


def _normalize(v, eps=1e-12):
    # 1/sqrt, not lax.rsqrt: sqrt and divide are IEEE-exact on both the
    # XLA and Mosaic lowerings, so the fused kernel epilogue and the XLA
    # shading path normalize bit-identically on hardware; rsqrt is an
    # approximation whose ulps differ between the two compilers and get
    # amplified ~shininess-fold by the specular pow (caught by
    # tools/tpu_gate.py on a real chip).
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1,
                                            keepdims=True), eps))


def attribute_channels(shading: str, has_colors: bool, has_light: bool):
    """G-buffer channel plan for a shading mode: list of (name, size).

    The G-buffer is the screen-space-interpolated attribute stack the
    deferred resolve produces (either the XLA gather path in
    ops/resolve.py or the Pallas plane-evaluation kernel in
    ops/binning.py); ``shade_gbuffer`` consumes it.
    """
    if shading == "vertex":
        return [("rgb", 3)]
    if shading == "flat":
        return []
    if shading == "phong":
        chans = [("rgb", 3)] if has_colors else []
        return chans + ([("normal", 3)] if has_light else [])
    if shading == "textured":
        chans = []
        if has_colors:
            chans.append(("rgb", 3))
        if has_light:
            chans.append(("normal", 3))
        return chans + [("uv", 2)]
    raise ValueError(f"unknown shading mode {shading!r}")


def gather_attribute_values(shading: str, tris, colors=None, normals=None,
                            uvs=None, has_light: bool = True):
    """Stack per-vertex attributes into [T, 3, A] per the channel plan."""
    chans = attribute_channels(shading, colors is not None, has_light)
    parts = []
    for name, _ in chans:
        if name == "rgb":
            parts.append(colors[tris])
        elif name == "normal":
            parts.append(normals[tris])
        elif name == "uv":
            parts.append(uvs[tris])
    if not parts:
        return None, chans
    return jnp.concatenate(parts, axis=-1), chans


def shade_gbuffer(gb, covered, *, shading: str, chans,
                  light: Optional[Light] = None,
                  texture: Optional[Texture] = None,
                  flat_color=(1.0, 1.0, 1.0),
                  normal_matrix=None,
                  view_dir=(0.0, 0.0, -1.0)):
    """Final lighting/texturing from an interpolated G-buffer.

    gb: [H, W, A] (A = sum of channel sizes, possibly 0/None).
    covered: [H, W] bool. Returns [H, W, 4] RGBA.
    """
    offsets = {}
    off = 0
    for name, size in chans:
        offsets[name] = (off, off + size)
        off += size

    def chan(name):
        a, b = offsets[name]
        return gb[..., a:b]

    shape = covered.shape
    if shading == "flat" or ("rgb" not in offsets
                             and shading in ("phong", "textured")):
        base = jnp.broadcast_to(jnp.asarray(flat_color, jnp.float32),
                                shape + (3,))
    elif "rgb" in offsets:
        base = chan("rgb")
    else:
        raise ValueError(f"no color source for shading {shading!r}")

    if shading == "textured":
        tex_rgb = sample_texture(texture, chan("uv"))[..., :3]
        base = tex_rgb if "rgb" not in offsets else base * tex_rgb

    if shading in ("phong", "textured") and light is not None \
            and "normal" in offsets:
        n = chan("normal")
        if normal_matrix is not None:
            n = n @ normal_matrix.T
        n = _normalize(n)
        l = -_normalize(jnp.asarray(light.direction, jnp.float32))
        v = _normalize(jnp.asarray(view_dir, jnp.float32))
        ndotl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)
        h = _normalize(l + v)
        ndoth = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
        spec = jnp.power(ndoth, light.shininess) * jnp.sign(ndotl)
        rgb = (base * (light.ambient + light.color * ndotl)
               + light.specular * spec)
    else:
        rgb = base

    alpha = jnp.where(covered, 1.0, 0.0)
    rgb = jnp.where(covered[..., None], rgb, 0.0)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Fused-shading support: the binned backend evaluates lighting inside the
# Pallas resolve kernel's epilogue while the G-buffer tile is still in VMEM
# (ops/binning.py fused_pipeline), leaving only the texture gather + final
# combine to XLA. The epilogue is expressed here as pure jnp on
# channel-first arrays so the exact same code runs on a [A, tile_h, tile_w]
# VMEM block inside the kernel and on a full [A, H, W] frame in the
# overflow fallback path.
# ---------------------------------------------------------------------------

# Params-row layout (f32[PARAMS_WIDTH], SMEM inside the kernel):
# 0:3 l (unit, toward light) | 3:6 h (unit half vector) | 6:9 light color
# | 9:12 ambient | 12:15 specular | 15 shininess | 16:19 flat_color
PARAMS_WIDTH = 32


def shading_params(light: Optional[Light], flat_color=(1.0, 1.0, 1.0),
                   view_dir=(0.0, 0.0, -1.0)) -> jax.Array:
    """Pack per-frame shading constants into one f32 row (kernel SMEM)."""
    p = jnp.zeros((PARAMS_WIDTH,), jnp.float32)
    if light is not None:
        l = -_normalize(jnp.asarray(light.direction, jnp.float32))
        v = _normalize(jnp.asarray(view_dir, jnp.float32))
        h = _normalize(l + v)
        p = p.at[0:3].set(l)
        p = p.at[3:6].set(h)
        p = p.at[6:9].set(jnp.asarray(light.color, jnp.float32))
        p = p.at[9:12].set(jnp.asarray(light.ambient, jnp.float32))
        p = p.at[12:15].set(jnp.asarray(light.specular, jnp.float32))
        p = p.at[15].set(jnp.asarray(light.shininess, jnp.float32))
    p = p.at[16:19].set(jnp.asarray(flat_color, jnp.float32))
    return p


def fused_output_channels(shading: str, chans, has_light: bool,
                          has_texture: bool):
    """Output channel plan of the fused epilogue: list of (name, size).

    'lit' = base * (ambient + light * ndotl) (pre-texture), 'spec' = the
    scalar specular term; 'rgb' = passthrough color; 'uv' passthrough.
    """
    names = {n for n, _ in chans}
    lit = has_light and "normal" in names
    out = []
    if shading in ("vertex", "flat") or not has_texture:
        # Final RGB computed in-kernel.
        out.append(("final", 3) if lit else ("rgb", 3))
    else:
        out.append(("lit", 3) if lit else ("rgb", 3))
        if lit:
            out.append(("spec", 1))
    if has_texture:
        out.append(("uv", 2))
    return out


def _chan_planes(planes, chans, name):
    """Pick channel `name`'s 2D planes out of a list of per-channel 2D
    arrays laid out per the (name, size) plan."""
    off = 0
    for n, size in chans:
        if n == name:
            return list(planes[off:off + size])
        off += size
    return None


def fused_epilogue(planes, covered, params, *, chans, has_light: bool,
                   has_texture: bool):
    """Per-channel G-buffer planes -> fused output planes (both lists of
    2D arrays — elementwise-only math, so the exact same code runs on a
    VMEM tile inside the Pallas kernel and on the whole frame in XLA for
    the overflow fallback).

    params: f32[PARAMS_WIDTH] per shading_params. Returns a list of C 2D
    arrays per fused_output_channels' plan.
    """
    rgb = _chan_planes(planes, chans, "rgb")
    nrm = _chan_planes(planes, chans, "normal")
    uv = _chan_planes(planes, chans, "uv")
    one = jnp.ones_like(covered, jnp.float32)
    base = rgb if rgb is not None else [params[16 + c] * one
                                        for c in range(3)]

    lit = has_light and nrm is not None
    outs = []
    if lit:
        # Normalize the interpolated normal; Blinn-Phong terms against the
        # packed per-frame constants (see shading_params layout).
        # 1/sqrt for cross-compiler bit-equality (see _normalize).
        inv = 1.0 / jnp.sqrt(jnp.maximum(
            nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2], 1e-12))
        nx, ny, nz = nrm[0] * inv, nrm[1] * inv, nrm[2] * inv
        ndotl = jnp.maximum(
            nx * params[0] + ny * params[1] + nz * params[2], 0.0)
        ndoth = jnp.maximum(
            nx * params[3] + ny * params[4] + nz * params[5], 0.0)
        spec = jnp.power(ndoth, params[15]) * jnp.sign(ndotl)
        lit_rgb = [base[c] * (params[9 + c] + params[6 + c] * ndotl)
                   for c in range(3)]
        if has_texture:
            outs += lit_rgb
            outs.append(spec)
        else:
            outs += [lit_rgb[c] + params[12 + c] * spec for c in range(3)]
    else:
        outs += base
    if has_texture:
        outs += uv
    zero = jnp.zeros_like(one)
    return [jnp.where(covered, o, zero) for o in outs]


def perspective_epilogue(planes, covered, params, *, inner):
    """Perspective-correct wrapper for a fused epilogue.

    planes: A screen-affine ``attr * (1/w)`` planes plus a trailing
    ``1/w`` plane (both are affine in screen space because attr/w and 1/w
    are — the standard projective-interpolation identity). Dividing the
    interpolated numerators by the interpolated 1/w yields exactly
    ``sum_i (ws_i / w_i) attr_i / sum_j (ws_j / w_j)`` — the same math as
    ops/resolve.py perspective_correct_weights, evaluated per-pixel with
    no gathers, inside the kernel (extension beyond the reference's
    screen-linear rule, Shaders.metal:157,162).
    """
    invw = planes[-1]
    one = jnp.ones_like(invw)
    # Covered pixels have interp(1/w) > 0 (near-plane culling/clipping
    # guarantees w > 0 on all corners); uncovered lanes divide by 1 and
    # are masked by the inner epilogue's covered select.
    rec = one / jnp.where(covered, invw, one)
    return inner([p * rec for p in planes[:-1]], covered, params)


def perspective_vertex_attrs(attrs, w_corners):
    """[T, 3, A] attrs + [T, 3] clip-space w -> [T, 3, A+1] numerator
    attributes (attr/w) with a trailing 1/w channel, for
    :func:`perspective_epilogue`."""
    invw = 1.0 / jnp.where(w_corners == 0.0, 1.0, w_corners)
    return jnp.concatenate([attrs * invw[:, :, None], invw[:, :, None]],
                           axis=-1)


def finish_fused(out_cf, covered, *, out_chans,
                 light: Optional[Light] = None,
                 texture: Optional[Texture] = None):
    """XLA tail after the fused kernel: texture gather + combine + alpha.

    out_cf: [C, H, W] fused epilogue outputs. Returns [H, W, 4] RGBA.

    Every intermediate stays a full-width [H, W] plane (channel-first);
    the only channel-last tensors are the single quad-gather result inside
    the planar texture sampler and the final output stack — narrow
    minor-dim ([H, W, 2/3]) tensors tile to 128 lanes on TPU and turn each
    elementwise op into a padded relayout.
    """
    from .texture import (COMPACT_SEG, sample_texture_planes,
                          sample_texture_planes_compacted,
                          sample_texture_planes_trilinear_compacted)

    names = {n for n, _ in out_chans}
    planes = [out_cf[c] for c in range(out_cf.shape[0])]
    rgb = list(_chan_planes(planes, out_chans, "final")
               or _chan_planes(planes, out_chans, "rgb")
               or _chan_planes(planes, out_chans, "lit"))
    if "uv" in names and texture is not None:
        u, v = _chan_planes(planes, out_chans, "uv")
        if (texture.filter == "bilinear" and u.ndim == 2
                and u.shape[1] % COMPACT_SEG == 0):
            # Quad-gather only the covered row segments (the gather is
            # row-issue-bound and most rows are wasted on uncovered
            # pixels; bit-equal, whole-frame fallback when coverage
            # exceeds the compaction cap).
            tex = sample_texture_planes_compacted(texture, u, v, covered)
        elif (texture.filter == "trilinear" and u.ndim == 2
                and u.shape[1] % COMPACT_SEG == 0):
            # Same compaction for the mipmapped sampler: footprint
            # full-frame, log2 + both level gathers at the tier cap
            # (bit-equal per covered pixel; measured in docs/PERF.md r5).
            tex = sample_texture_planes_trilinear_compacted(
                texture, u, v, covered)
        else:
            tex = sample_texture_planes(texture, u, v)
        if len(tex) == 1:  # single-channel texture broadcasts (as the
            tex = tex * 3  # XLA shade() path's [..., :3] slice does)
        rgb = [rgb[c] * tex[c] for c in range(3)]
    if "spec" in names:
        spec = _chan_planes(planes, out_chans, "spec")[0]
        ks = jnp.asarray(light.specular, jnp.float32)
        rgb = [rgb[c] + ks[c] * spec for c in range(3)]
    zero = jnp.zeros_like(covered, jnp.float32)
    one = jnp.ones_like(covered, jnp.float32)
    rgb = [jnp.where(covered, p, zero) for p in rgb]
    alpha = jnp.where(covered, one, zero)
    return jnp.stack(rgb + [alpha], axis=-1)


def shade(setup, tri_id, tris, *, shading: str,
          colors=None, normals=None, uvs=None,
          light: Optional[Light] = None,
          texture: Optional[Texture] = None,
          flat_color=(1.0, 1.0, 1.0),
          normal_matrix=None,
          view_dir=(0.0, 0.0, -1.0),
          y_start=0,
          w_tri=None,
          corner_attrs=None):
    """Shade the frame from a visibility buffer.

    Args:
      setup: TriangleSetup.
      tri_id: [H, W] int32 winning triangle ids.
      tris: [T, 3] vertex indices (to gather per-vertex attributes).
      shading: 'vertex' | 'flat' | 'phong' | 'textured'.
      colors/normals/uvs: per-vertex attribute arrays ([N,3]/[N,3]/[N,2]).
      light: required for 'phong' (and applied for 'textured' when given).
      texture: required for 'textured'.
      flat_color: RGB for 'flat'.
      normal_matrix: optional [3,3] to take normals to lighting space.
      view_dir: direction from the surface toward the viewer in lighting
        space; the reference's implied camera sits at (0,0,-1) looking down
        +z (3d.md, Renderer.swift:134-140), hence the (0,0,-1) default.
      corner_attrs: optional precomputed ([T, 3, A] attrs, chans) pair,
        bypassing the per-vertex gather — used when the triangle list does
        not index the mesh directly (near-plane-clipped corners).

    Returns: color [H, W, 4] float32.
    """
    if shading == "vertex" and colors is None:
        raise ValueError("'vertex' shading requires per-vertex colors")
    if shading == "textured" and (uvs is None or texture is None):
        raise ValueError("'textured' shading requires uvs + texture")
    if corner_attrs is not None:
        attrs, chans = corner_attrs
    else:
        attrs, chans = gather_attribute_values(
            shading, tris, colors=colors, normals=normals, uvs=uvs,
            has_light=light is not None and normals is not None)
    from ..framebuffer import NO_TRIANGLE
    covered = tri_id != NO_TRIANGLE
    if attrs is not None:
        ws, covered = barycentrics_at_pixels(setup, tri_id, y_start)
        if w_tri is not None:
            from .resolve import perspective_correct_weights
            ws = perspective_correct_weights(ws, w_tri, tri_id, covered)
        gb = interpolate_attribute(attrs, tri_id, ws, covered)
    else:
        gb = None
    return shade_gbuffer(gb, covered, shading=shading, chans=chans,
                         light=light, texture=texture,
                         flat_color=flat_color,
                         normal_matrix=normal_matrix, view_dir=view_dir)
