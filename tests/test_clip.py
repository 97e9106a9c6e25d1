"""Near-plane clipping/culling (ops/clip.py).

The reference divides by clip-w unconditionally (Shaders.metal:68), so a
triangle straddling the eye plane rasterizes garbage there. Our contract:
by default such triangles are culled; with RenderPass.clip_near=True they
are clipped exactly against w = eps. Coverage of the clipped render must
match a numpy Sutherland-Hodgman oracle bit-for-bit (both sides compute the
clip in the same float32 op order).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.ops import transforms as tf
from software_renderer_tpu.testing.oracle import (
    oracle_clip_near, oracle_rasterize)

W = H = 96


def straddling_scene():
    """A quad whose near edge sits BEHIND the eye under perspective() +
    look_at — exactly the reachable hole VERDICT r1 called out."""
    positions = np.array([
        [-1.0, -0.3,  1.0], [1.0, -0.3,  1.0],    # behind the eye (w < 0)
        [1.0, -0.3, -4.0], [-1.0, -0.3, -4.0],    # far, in front
    ], np.float32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]],
                      np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    mesh = sr.mesh_from_numpy(positions, tris.reshape(-1), colors=colors)
    proj = tf.perspective(np.pi / 3, 1.0, 0.1, 10.0)
    view = tf.look_at(eye=(0.0, 0.4, 0.0), target=(0.0, -0.3, -2.0))
    rp = sr.RenderPass(mesh=mesh, transform=proj @ view, width=W, height=H,
                       shading="vertex")
    return rp, positions, tris, colors


def oracle_clipped_render(positions, tris, colors, transform):
    corners = positions[tris]                       # [T, 3, 3]
    screen, bary, src = oracle_clip_near(corners, transform, W, H)
    colors_tri = np.einsum("kij,kja->kia", bary,
                           colors[tris][src]).astype(np.float32)
    k = screen.shape[0]
    return oracle_rasterize(screen.reshape(k * 3, 3),
                            np.arange(k * 3).reshape(k, 3),
                            colors_tri, W, H)


def test_clip_near_matches_oracle():
    rp, positions, tris, colors = straddling_scene()
    rp = dataclasses.replace(rp, clip_near=True)
    fb = sr.render(rp, backend="reference")
    ours = np.asarray(fb.color)
    orc_c, orc_d, _ = oracle_clipped_render(positions, tris, colors,
                                            np.asarray(rp.transform))
    # Coverage must match EXACTLY (same f32 clip math on both sides).
    np.testing.assert_array_equal(ours[..., 3], orc_c[..., 3])
    # A substantial part of the frame must be covered (the clipped quad
    # fills the lower half of the view).
    assert (ours[..., 3] > 0).mean() > 0.2
    # Colors interpolate through the clip: tight tolerance.
    cov = orc_c[..., 3] > 0
    np.testing.assert_allclose(ours[cov], orc_c[cov], atol=2e-3)


def test_default_cull_drops_straddlers_no_garbage():
    rp, positions, tris, colors = straddling_scene()
    fb = sr.render(rp, backend="reference")  # clip_near=False (default)
    ours = np.asarray(fb.color)
    # Both triangles touch a behind-the-eye vertex -> both culled: frame
    # empty, no garbage coverage anywhere (the reference would smear).
    assert np.all(ours == 0.0)


def test_default_cull_keeps_in_front_geometry():
    rp, positions, tris, colors = straddling_scene()
    # Shift the quad fully in front of the eye: nothing may be culled.
    positions2 = positions.copy()
    positions2[:, 2] -= 2.0
    mesh = sr.mesh_from_numpy(positions2, tris.reshape(-1), colors=colors)
    rp = dataclasses.replace(rp, mesh=mesh)
    fb = sr.render(rp, backend="reference")
    assert (np.asarray(fb.color)[..., 3] > 0).mean() > 0.1


def test_clip_noop_when_all_in_front():
    rp, positions, tris, colors = straddling_scene()
    positions2 = positions.copy()
    positions2[:, 2] -= 2.0
    mesh = sr.mesh_from_numpy(positions2, tris.reshape(-1), colors=colors)
    rp = dataclasses.replace(rp, mesh=mesh)
    fb_plain = sr.render(rp, backend="reference")
    fb_clip = sr.render(dataclasses.replace(rp, clip_near=True),
                        backend="reference")
    # Case 0 passes the original corners through untouched: bit-equal.
    np.testing.assert_array_equal(np.asarray(fb_plain.color),
                                  np.asarray(fb_clip.color))
    np.testing.assert_array_equal(np.asarray(fb_plain.depth),
                                  np.asarray(fb_clip.depth))


def test_clip_binned_matches_reference():
    rp, *_ = straddling_scene()
    rp = dataclasses.replace(rp, clip_near=True)
    fb_ref = sr.render(rp, backend="reference")
    fb_bin = sr.render(rp, backend="binned")
    np.testing.assert_array_equal(np.asarray(fb_ref.color)[..., 3],
                                  np.asarray(fb_bin.color)[..., 3])
    np.testing.assert_allclose(np.asarray(fb_ref.color),
                               np.asarray(fb_bin.color), atol=1e-4)


def test_clip_textured_phong_modes_run():
    # Clipping composes per-corner attributes (uv, normals) through the
    # cut; exercise the textured+lit path end to end on all backends.
    rp, positions, tris, colors = straddling_scene()
    normals = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh = sr.mesh_from_numpy(positions, tris.reshape(-1), colors=colors,
                              normals=normals, uvs=uvs)
    rp = dataclasses.replace(
        rp, mesh=mesh, clip_near=True, shading="textured",
        texture=sr.checkerboard(32, 4), light=sr.Light.default())
    fb_ref = sr.render(rp, backend="reference")
    fb_bin = sr.render(rp, backend="binned")
    a, b = np.asarray(fb_ref.color), np.asarray(fb_bin.color)
    assert (a[..., 3] > 0).mean() > 0.2
    np.testing.assert_array_equal(a[..., 3], b[..., 3])
    np.testing.assert_allclose(a, b, atol=1e-3)
