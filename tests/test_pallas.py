"""Pallas visibility kernel vs the XLA reference backend.

Both consume identical TriangleSetup records and make exact coverage
decisions, so depth and triangle-id buffers must match bit-for-bit
(SURVEY.md §4: dual implementations as cross-check)."""

import numpy as np
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.ops.rasterize_pallas import visibility_pallas
from software_renderer_tpu.ops.rasterize_ref import visibility_ref
from software_renderer_tpu.ops.setup import triangle_setup
from software_renderer_tpu.ops.vertex import vertex_stage


def both_backends(positions, tris, transform, width, height):
    screen, _ = vertex_stage(jnp.asarray(positions), jnp.asarray(transform),
                             width, height)
    setup = triangle_setup(screen, jnp.asarray(tris), width, height)
    d_ref, id_ref = visibility_ref(setup, width=width, height=height)
    d_pal, id_pal = visibility_pallas(setup, width=width, height=height)
    return (np.asarray(d_ref), np.asarray(id_ref),
            np.asarray(d_pal), np.asarray(id_pal))


def assert_equal_vis(d_ref, id_ref, d_pal, id_pal):
    np.testing.assert_array_equal(id_ref, id_pal)
    np.testing.assert_array_equal(d_ref, d_pal)


def test_single_triangle_matches_reference():
    positions = np.array(
        [[0.0, 0.8, 0.2], [0.7, -0.5, 0.4], [-0.7, -0.5, 0.6]], np.float32)
    tris = np.array([[0, 1, 2]])
    assert_equal_vis(*both_backends(positions, tris, np.eye(4), 128, 128))


def test_non_tile_aligned_viewport():
    positions = np.array(
        [[0.0, 0.9, 0.2], [0.9, -0.9, 0.4], [-0.9, -0.9, 0.6]], np.float32)
    tris = np.array([[0, 1, 2]])
    # 100x60: exercises bottom/right partial tiles.
    assert_equal_vis(*both_backends(positions, tris, np.eye(4), 100, 60))


def test_random_scene_matches_reference():
    rng = np.random.default_rng(7)
    n = 60
    positions = rng.uniform(-1.2, 1.2, size=(n, 3)).astype(np.float32)
    positions[:, 2] = rng.uniform(0.0, 1.0, size=n)
    tris = rng.integers(0, n, size=(40, 3))
    assert_equal_vis(*both_backends(positions, tris, np.eye(4), 160, 96))


def test_more_triangles_than_one_chunk():
    rng = np.random.default_rng(11)
    n = 200
    positions = rng.uniform(-1.2, 1.2, size=(n, 3)).astype(np.float32)
    positions[:, 2] = rng.uniform(0.0, 1.0, size=n)
    tris = rng.integers(0, n, size=(97, 3))  # 4 chunks with padding
    assert_equal_vis(*both_backends(positions, tris, np.eye(4), 128, 128))


def test_sphere_scene_end_to_end_pallas():
    mesh = sr.shapes.uv_sphere(radius=0.2, segments=13, inward_normals=True)
    transform = sr.transforms.reference_demo_transform(1.3)
    rp = sr.RenderPass(mesh=mesh, transform=transform, width=128, height=128)
    fb_ref = sr.render(rp, backend="reference")
    fb_pal = sr.render(rp, backend="pallas")
    np.testing.assert_array_equal(np.asarray(fb_ref.depth),
                                  np.asarray(fb_pal.depth))
    np.testing.assert_array_equal(np.asarray(fb_ref.color),
                                  np.asarray(fb_pal.color))


def test_empty_scene_pallas():
    positions = np.zeros((3, 3), np.float32) + 10.0  # offscreen
    tris = np.array([[0, 1, 2]])
    d_ref, id_ref, d_pal, id_pal = both_backends(
        positions, tris, np.eye(4), 64, 64)
    assert np.all(id_pal == -1)
    assert np.all(np.isinf(d_pal))
