"""Perspective-correct interpolation (extension over the reference's
screen-space-linear rule)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.ops import transforms as tf


def slanted_quad_rp(perspective_correct, width=64, height=64):
    # A quad receding in depth under a real perspective projection: linear
    # vs perspective-correct UV interpolation differ visibly mid-quad.
    positions = np.array([
        [-0.5, -0.2, -0.5], [0.5, -0.2, -0.5],   # near edge
        [0.5, -0.2, -3.0], [-0.5, -0.2, -3.0],   # far edge
    ], np.float32)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    colors = np.ones((4, 3), np.float32)
    mesh = sr.mesh_from_numpy(positions, np.array([0, 1, 2, 0, 2, 3]),
                              colors=colors, uvs=uvs)
    proj = tf.perspective(np.pi / 3, 1.0, 0.1, 10.0)
    view = tf.look_at(eye=(0.0, 0.3, 0.5), target=(0.0, -0.2, -2.0))
    return sr.RenderPass(mesh=mesh, transform=proj @ view,
                         width=width, height=height, shading="textured",
                         texture=sr.checkerboard(64, 8),
                         perspective_correct=perspective_correct)


def test_perspective_correct_differs_from_linear():
    fb_lin = sr.render(slanted_quad_rp(False), backend="reference")
    fb_pc = sr.render(slanted_quad_rp(True), backend="reference")
    a = np.asarray(fb_lin.color)
    b = np.asarray(fb_pc.color)
    covered = (a[..., 3] > 0) & (b[..., 3] > 0)
    assert covered.sum() > 200
    diff = np.abs(a[..., :3] - b[..., :3]).max(axis=-1)
    assert (diff[covered] > 0.2).mean() > 0.05  # visibly different texels


def test_perspective_correct_weights_sum_to_one():
    from software_renderer_tpu.ops.resolve import (
        barycentrics_at_pixels, perspective_correct_weights)
    from software_renderer_tpu.ops.setup import triangle_setup
    from software_renderer_tpu.ops.vertex import vertex_stage
    from software_renderer_tpu.ops.rasterize_ref import visibility_ref

    rp = slanted_quad_rp(True)
    screen, w = vertex_stage(rp.mesh.positions, rp.transform, 64, 64)
    tris = rp.mesh.triangles()
    setup = triangle_setup(screen, tris, 64, 64)
    _, tid = visibility_ref(setup, width=64, height=64)
    ws, covered = barycentrics_at_pixels(setup, tid)
    wc = perspective_correct_weights(ws, w[tris], tid, covered)
    s = np.asarray(jnp.sum(wc, axis=-1))[np.asarray(covered)]
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-5)


def test_binned_perspective_correct_matches_reference():
    # The binned backend now runs perspective-correct INSIDE the fused
    # kernel (attr/w + 1/w planes, divide in the epilogue) — same math as
    # the reference backend's corrected barycentrics, different
    # factorization, so tolerance is ulp-class not exact.
    fb_ref = sr.render(slanted_quad_rp(True), backend="reference")
    fb_bin = sr.render(slanted_quad_rp(True), backend="binned")
    np.testing.assert_array_equal(np.asarray(fb_ref.depth),
                                  np.asarray(fb_bin.depth))
    np.testing.assert_array_equal(np.asarray(fb_ref.color[..., 3]),
                                  np.asarray(fb_bin.color[..., 3]))
    np.testing.assert_allclose(np.asarray(fb_ref.color),
                               np.asarray(fb_bin.color), atol=1e-4)


def test_fused_perspective_lit_textured_matches_reference():
    """Perspective-correct through the FULL fused epilogue (lighting +
    texture): binned == reference-backend output on a lit slanted quad."""
    import dataclasses as dc
    from software_renderer_tpu.ops.shading import Light
    rp = slanted_quad_rp(True)
    rp = dc.replace(rp, light=Light.default(), model=jnp.eye(4))
    fb_ref = sr.render(rp, backend="reference")
    fb_bin = sr.render(rp, backend="binned")
    np.testing.assert_array_equal(np.asarray(fb_ref.color[..., 3]),
                                  np.asarray(fb_bin.color[..., 3]))
    np.testing.assert_allclose(np.asarray(fb_ref.color),
                               np.asarray(fb_bin.color), atol=2e-3)


def test_fused_perspective_uv_matches_oracle_math():
    """The fused path's per-pixel UV equals the closed-form projective
    interpolation (attr/w interp over 1/w interp) computed in numpy from
    the winner map — not merely 'close to the other backend'."""
    from software_renderer_tpu.ops.resolve import (
        barycentrics_at_pixels, perspective_correct_weights)
    from software_renderer_tpu.ops.setup import triangle_setup
    from software_renderer_tpu.ops.vertex import vertex_stage
    from software_renderer_tpu.ops.rasterize_ref import visibility_ref

    rp = slanted_quad_rp(True)
    fb_bin = sr.render(rp, backend="binned")
    screen, w = vertex_stage(rp.mesh.positions, rp.transform, 64, 64)
    tris = rp.mesh.triangles()
    setup = triangle_setup(screen, tris, 64, 64)
    _, tid = visibility_ref(setup, width=64, height=64)
    ws, covered = barycentrics_at_pixels(setup, tid)
    wc = perspective_correct_weights(ws, w[tris], tid, covered)
    uvs = rp.mesh.uvs[tris]  # [T, 3, 2]
    uv_ref = jnp.einsum("hwk,hwkc->hwc", wc,
                        uvs[jnp.where(covered, tid, 0)])
    from software_renderer_tpu.ops.texture import sample_texture
    tex_ref = sample_texture(rp.texture, uv_ref)
    got = np.asarray(fb_bin.color[..., :3])
    want = np.asarray(jnp.where(covered[..., None], tex_ref[..., :3], 0.0))
    cov = np.asarray(covered)
    assert cov.sum() > 200
    np.testing.assert_allclose(got[cov], want[cov], atol=2e-3)
