"""2D primitives: rect, circle, line, 2D triangle (reference components
3/13), and line/point primitive paths (components 11/12)."""

import numpy as np
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import primitives2d as p2


def blank(h=64, w=64):
    return jnp.zeros((h, w, 4), jnp.float32)


def test_rect_fill():
    img = np.asarray(p2.draw_rect(blank(), 8, 16, 20, 10, (1.0, 0.0, 0.0)))
    assert img[16, 8, 0] == 1.0          # top-left inside
    assert img[25, 27, 0] == 1.0         # bottom-right inside
    assert img[15, 8, 0] == 0.0          # above
    assert img[16, 28, 0] == 0.0         # right of
    assert img[..., 0].sum() == 20 * 10  # exact fill area


def test_circle_smoothstep_rim():
    img = np.asarray(p2.draw_circle(blank(), 32, 32, 12, (0.0, 0.0, 1.0)))
    assert img[32, 32, 2] == 1.0                   # center opaque
    assert img[32, 32 + 20, 2] == 0.0              # outside
    ring = img[32, 32 + 12, 2]                     # on the rim: partial
    assert 0.0 < ring < 1.0


def test_line_dda():
    img = np.asarray(p2.draw_line(blank(), 2, 2, 40, 30, (0.0, 1.0, 0.0)))
    assert img[2, 2, 1] == 1.0
    # Line visits max(|dx|,|dy|) = 38 pixels (endpoint exclusive like the
    # reference's 0..<steps loop).
    assert (img[..., 1] > 0).sum() == 38


def test_triangle2d_rgb_basis():
    img = np.asarray(p2.draw_triangle2d(blank(), (32, 4), (4, 60), (60, 60)))
    # Near corner a -> red dominates, etc.
    assert img[8, 32, 0] > 0.8
    assert img[56, 8, 1] > 0.7
    assert img[56, 56, 2] > 0.7
    assert img[4, 4, 3] == 0.0  # outside untouched


def test_wireframe_cube_scene():
    rp = scenes.wireframe_cube(0.5, width=96, height=96)
    fb = sr.render(rp, backend="reference")
    c = np.asarray(fb.color)
    assert (c[..., 1] > 0.5).sum() > 50      # green wireframe pixels
    assert (c[..., 3] > 0).mean() < 0.3      # mostly empty background


def test_points_primitive():
    positions = np.array([[0.0, 0.0, 0.2], [0.5, 0.5, 0.2]], np.float32)
    colors = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    mesh = sr.mesh_from_numpy(positions, np.array([0, 1]), colors=colors)
    rp = sr.RenderPass(mesh=mesh, transform=jnp.eye(4), width=64, height=64,
                       primitive="point")
    fb = sr.render(rp, backend="reference")
    c = np.asarray(fb.color)
    assert c[32, 32, 0] == 1.0   # NDC origin -> pixel (32, 32)
    assert (c[..., 3] > 0).sum() == 2
