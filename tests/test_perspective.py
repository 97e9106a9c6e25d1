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
    fb_ref = sr.render(slanted_quad_rp(True), backend="reference")
    fb_bin = sr.render(slanted_quad_rp(True), backend="binned")
    np.testing.assert_allclose(np.asarray(fb_ref.color),
                               np.asarray(fb_bin.color), atol=1e-4)
