import numpy as np
import jax.numpy as jnp

from software_renderer_tpu.ops.vertex import vertex_stage, transform_vertices
from software_renderer_tpu.testing.oracle import oracle_vertex_stage


def test_ndc_to_pixel_formula():
    # NDC (-1,-1) -> uv (0, 1) -> pixel (0, H); NDC (1,1) -> (W, 0).
    pos = jnp.array([[-1.0, -1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 0.5]])
    screen, w = vertex_stage(pos, jnp.eye(4), 512, 512)
    np.testing.assert_allclose(screen[0], [0.0, 512.0, 0.0])
    np.testing.assert_allclose(screen[1], [512.0, 0.0, 0.0])
    np.testing.assert_allclose(screen[2], [256.0, 256.0, 0.5])
    np.testing.assert_allclose(w, np.ones(3))


def test_perspective_divide():
    # w = z + 1 projection: point at z=1 halves x,y.
    m = jnp.array([
        [1.0, 0, 0, 0],
        [0, 1.0, 0, 0],
        [0, 0, 1.0, 0],
        [0, 0, 1.0, 1.0],
    ])
    ndc, w = transform_vertices(jnp.array([[0.8, -0.4, 1.0]]), m)
    np.testing.assert_allclose(w, [2.0])
    np.testing.assert_allclose(ndc[0], [0.4, -0.2, 0.5], rtol=1e-6)


def test_matches_oracle_random():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[3, 2] = 1.0  # w = z + 1
    ours, _ = vertex_stage(jnp.asarray(pos), jnp.asarray(m), 512, 512)
    theirs = oracle_vertex_stage(pos, m, 512, 512)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_rounding_half_away():
    # uv*W landing exactly on .5 must round away from zero
    # (Swift .toNearestOrAwayFromZero, Renderer.swift:168).
    pos = jnp.array([[(2 * 2.5 / 8.0) - 1.0, 0.0, 0.0]])  # uv.x*8 = 2.5
    screen, _ = vertex_stage(pos, jnp.eye(4), 8, 8)
    assert float(screen[0, 0]) == 3.0
