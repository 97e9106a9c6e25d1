"""Golden tests: the XLA reference backend vs the numpy oracle.

Coverage (which pixels a triangle owns) must match the oracle *exactly* —
both sides make the inside decision from exact-in-float32 edge functions
(see ops/setup.py docstring). Depth/color values may differ by ulps, so
winners between nearly-equal-depth triangles (intersection seams) get a
small mismatch allowance.
"""

import numpy as np
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.testing.oracle import oracle_render


def render_ours(positions, tris, colors, transform, width, height):
    mesh = sr.mesh_from_numpy(positions, np.asarray(tris).reshape(-1),
                              colors=colors)
    rp = sr.RenderPass(mesh=mesh, transform=jnp.asarray(transform),
                       width=width, height=height, shading="vertex")
    fb = sr.render(rp, backend="reference")
    return np.asarray(fb.color), np.asarray(fb.depth)


def assert_images_match(ours_c, ours_d, orc_c, orc_d, max_bad_frac=0.0):
    bad = ~np.isclose(ours_c, orc_c, atol=2e-3)
    bad_px = bad.any(axis=-1)
    frac = bad_px.mean()
    assert frac <= max_bad_frac, (
        f"{bad_px.sum()} mismatching pixels ({frac:.4%}) "
        f"at {np.argwhere(bad_px)[:10]}"
    )
    # Compare depth only where the same triangle won (pixels whose color
    # already matched); winner flips on exact-edge pixels change depth too.
    both_covered = np.isfinite(ours_d) & np.isfinite(orc_d) & ~bad_px
    np.testing.assert_allclose(ours_d[both_covered], orc_d[both_covered],
                               atol=1e-4)


def test_single_triangle():
    positions = np.array(
        [[0.0, 0.8, 0.2], [0.7, -0.5, 0.2], [-0.7, -0.5, 0.2]], np.float32)
    colors = np.eye(3, dtype=np.float32)
    tris = np.array([[0, 1, 2]])
    ours = render_ours(positions, tris, colors, np.eye(4), 64, 64)
    orc_c, orc_d, _ = oracle_render(positions, tris, colors, np.eye(4), 64, 64)
    assert_images_match(*ours, orc_c, orc_d)
    assert np.asarray(ours[0])[..., 3].max() == 1.0  # something covered


def test_both_windings_render():
    # The reference does not cull backfaces: both windings must draw.
    positions = np.array(
        [[0.0, 0.8, 0.2], [0.7, -0.5, 0.2], [-0.7, -0.5, 0.2]], np.float32)
    colors = np.ones((3, 3), np.float32)
    for tri in ([[0, 1, 2]], [[0, 2, 1]]):
        c, d = render_ours(positions, np.array(tri), colors, np.eye(4), 32, 32)
        assert (c[..., 3] > 0).sum() > 50


def test_intersecting_triangles_depth():
    # The trianglesExample semantics (App.swift:284-342): two intersecting
    # triangles resolved by the z-buffer.
    positions = np.array([
        [0.0, 0.9, 0.3], [0.9, -0.9, 0.3], [-0.9, -0.9, 0.3],   # flat at z=.3
        [0.0, -0.9, 0.1], [0.6, 0.9, 0.6], [-0.6, 0.9, 0.6],    # sloped
    ], np.float32)
    colors = np.array([[1, 0, 0]] * 3 + [[0, 0, 1]] * 3, np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    ours = render_ours(positions, tris, colors, np.eye(4), 96, 96)
    orc_c, orc_d, _ = oracle_render(positions, tris, colors, np.eye(4), 96, 96)
    # Allow a sliver of seam pixels to differ (depth-tie ulp flips).
    assert_images_match(*ours, orc_c, orc_d, max_bad_frac=0.003)
    # Both colors must be visible (the sloped triangle pierces the flat one).
    ours_c = ours[0]
    assert (ours_c[..., 0] > 0.5).any() and (ours_c[..., 2] > 0.5).any()


def test_random_meshes_match_oracle():
    rng = np.random.default_rng(42)
    for trial in range(4):
        n = 24
        positions = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        positions[:, 2] = rng.uniform(0.05, 0.95, size=n)
        colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        tris = rng.integers(0, n, size=(16, 3))
        ours = render_ours(positions, tris, colors, np.eye(4), 64, 64)
        orc_c, orc_d, _ = oracle_render(positions, tris, colors,
                                        np.eye(4), 64, 64)
        # Random integer-coordinate slivers frequently put edges exactly on
        # pixel centers; there the reference itself decides coverage from a
        # *rounded* 1 - w0 - w1 (Shaders.metal:149), so either answer is
        # faithful. Allow a small fraction of exact-edge pixels to differ.
        assert_images_match(*ours, orc_c, orc_d, max_bad_frac=0.006)


def test_reference_sphere_scene():
    # The reference's live demo: MDL-style sphere, abs(normal) colors,
    # animated transform at a fixed time (App.swift:124-185).
    mesh = sr.shapes.uv_sphere(radius=0.2, segments=13, inward_normals=True)
    transform = sr.transforms.reference_demo_transform(0.7)
    rp = sr.RenderPass(mesh=mesh, transform=transform, width=128, height=128,
                       shading="vertex")
    fb = sr.render(rp, backend="reference")
    color = np.asarray(fb.color)
    orc_c, orc_d, _ = oracle_render(
        np.asarray(mesh.positions), np.asarray(mesh.triangles()),
        np.asarray(mesh.colors), np.asarray(transform), 128, 128)
    bad = (~np.isclose(color, orc_c, atol=2e-3)).any(axis=-1)
    assert bad.mean() < 0.005, f"{bad.sum()} mismatching pixels"
    # Scene sanity: the projected sphere disc (~12.8 px radius at 128^2:
    # NDC r = 0.2*2/w, w ~= 2) covers ~3.1% of the frame.
    assert 0.02 < (color[..., 3] > 0).mean() < 0.06


def test_empty_scene_is_clear():
    mesh = sr.mesh_from_numpy(np.zeros((3, 3), np.float32) + 10.0,  # offscreen
                              np.array([0, 1, 2]), colors=np.ones((3, 3)))
    rp = sr.RenderPass(mesh=mesh, transform=jnp.eye(4), width=32, height=32)
    fb = sr.render(rp, backend="reference")
    assert np.all(np.asarray(fb.color) == 0.0)
    assert np.all(np.isinf(np.asarray(fb.depth)))
