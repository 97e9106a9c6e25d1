"""Batched (vmap) and sharded (shard_map over a virtual 8-device CPU mesh)
rendering, plus the texture-optimization training step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import software_renderer_tpu as sr
from software_renderer_tpu.models import scenes
from software_renderer_tpu.parallel.batch import render_batch
from software_renderer_tpu.parallel.sharding import (
    make_mesh, render_sharded, texture_train_step)
from software_renderer_tpu.ops import transforms as tf


def demo_rp(width=64, height=64):
    mesh = sr.shapes.uv_sphere(radius=0.2, segments=9, inward_normals=True)
    return sr.RenderPass(mesh=mesh, transform=jnp.eye(4),
                         width=width, height=height, shading="vertex")


def batch_transforms(n):
    times = jnp.linspace(0.0, 1.0, n)
    return jax.vmap(tf.reference_demo_transform)(times)


def test_vmap_batch_matches_loop():
    rp = demo_rp()
    transforms = batch_transforms(3)
    fb = render_batch(rp, transforms, backend="reference")
    assert fb.color.shape == (3, 64, 64, 4)
    for i in range(3):
        single = sr.render(
            dataclasses.replace(rp, transform=transforms[i]),
            backend="reference")
        np.testing.assert_array_equal(np.asarray(fb.color[i]),
                                      np.asarray(single.color))


def test_row_slicing_exact():
    # Row slices keep global pixel coordinates, so coverage decisions are
    # exact; depth values may differ by codegen ulps (XLA fuses the depth
    # FMA differently per shape), flipping depth *ties* at shared edges.
    # assert_tie_class_equal checks that failure mode itself: every
    # differing pixel must carry ~equal depth in both renders.
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    rp = demo_rp()
    t = tf.reference_demo_transform(0.4)
    rp = dataclasses.replace(rp, transform=t)
    from software_renderer_tpu.render import render_rows
    full = sr.render(rp, backend="reference")
    top = render_rows(rp, y_start=0, rows=32, backend="reference")
    bot = render_rows(rp, y_start=32, rows=32, backend="reference")
    color = np.concatenate([np.asarray(top.color), np.asarray(bot.color)])
    depth = np.concatenate([np.asarray(top.depth), np.asarray(bot.depth)])
    assert_tie_class_equal(full.color, color, full.depth, depth,
                           context="row slicing")


def test_sharded_render_8_devices():
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    assert len(jax.devices()) == 8
    mesh = make_mesh(2, 4)
    rp = demo_rp()
    transforms = batch_transforms(4)  # 2 frames per shard
    fb = render_sharded(rp, transforms, mesh, backend="reference")
    assert fb.color.shape == (4, 64, 64, 4)
    # Equality vs unsharded batch (up to FMA-codegen ulps flipping depth
    # ties at shared edges, see test_row_slicing_exact).
    fb_ref = render_batch(rp, transforms, backend="reference")
    assert_tie_class_equal(fb.color, fb_ref.color, fb.depth, fb_ref.depth,
                           context="8-device shard_map")


def test_sharded_render_production_backend():
    """The SHIPPED default path: render_sharded with backend='auto'
    (-> the binned fused pipeline) under shard_map, frames scanned (never
    vmapped — the banded Pallas kernel must not take a batch grid dim),
    rows offset via a traced axis_index y_start. Cross-checked against
    the independent reference backend, unsharded."""
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    mesh = make_mesh(2, 4)
    rp = demo_rp()
    transforms = batch_transforms(4)
    fb = render_sharded(rp, transforms, mesh)  # shipped default: 'auto'
    assert fb.color.shape == (4, 64, 64, 4)
    fb_ref = render_batch(rp, transforms, backend="reference")
    # Coverage must be bit-exact (one shared front-end; row sharding only
    # shifts the viewport); color/depth up to the documented tie class.
    np.testing.assert_array_equal(np.asarray(fb.color[..., 3]),
                                  np.asarray(fb_ref.color[..., 3]))
    assert_tie_class_equal(fb.color, fb_ref.color, fb.depth, fb_ref.depth,
                           atol=2e-4,
                           context="8-device shard_map, binned backend")


def test_render_rows_binned_offset():
    """render_rows on the PRODUCTION binned backend with y_start != 0 —
    the per-shard configuration of render_sharded — against the same
    rows of an unsharded binned frame."""
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    from software_renderer_tpu.render import render_rows
    rp = demo_rp()
    rp = dataclasses.replace(rp, transform=tf.reference_demo_transform(0.4))
    full = sr.render(rp, backend="binned")
    for y0, rows in ((32, 32), (16, 32)):
        part = render_rows(rp, y_start=y0, rows=rows, backend="binned")
        assert part.color.shape == (rows, 64, 4)
        np.testing.assert_array_equal(
            np.asarray(part.color[..., 3]),
            np.asarray(full.color[y0:y0 + rows, :, 3]))
        assert_tie_class_equal(part.color, full.color[y0:y0 + rows],
                               part.depth, full.depth[y0:y0 + rows],
                               context=f"binned render_rows y0={y0}")


def test_tie_class_check_catches_row_shift():
    """The tie-class comparison must FAIL on an artificial 1-row shift —
    the injected-bug sensitivity a blanket <0.5% tolerance lacks."""
    import pytest
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    rp = demo_rp()
    rp = dataclasses.replace(rp, transform=tf.reference_demo_transform(0.4))
    full = sr.render(rp, backend="reference")
    color = np.asarray(full.color)
    depth = np.asarray(full.depth)
    shifted_c = np.roll(color, 1, axis=0)
    shifted_d = np.roll(depth, 1, axis=0)
    with pytest.raises(AssertionError):
        assert_tie_class_equal(color, shifted_c, depth, shifted_d,
                               context="injected 1-row shift")
    # Also with a *small* shifted region (under the pixel-count tolerance):
    # 1 row of 64 = 2.4% -> shift only a 16-pixel strip (0.4% of pixels),
    # still a real bug the depth-tie condition must catch.
    small_c = color.copy()
    small_d = depth.copy()
    # Pick a strip crossing the sphere so depths actually change.
    src = slice(28, 44)
    small_c[32, src] = color[33, src]
    small_d[32, src] = depth[33, src]
    changed = ~np.isclose(small_d[32, src], depth[32, src], atol=1e-6)
    assert changed.any(), "strip choice must actually alter depths"
    with pytest.raises(AssertionError):
        assert_tie_class_equal(color, small_c, depth, small_d,
                               context="injected 16px strip shift")


def test_fused_geometry_grad_warns_and_texture_grad_does_not():
    """Differentiating default render w.r.t. GEOMETRY must emit the
    trace-time zero-gradient warning (render._warn_fused_geometry_grads);
    texture-only optimization through the same default path must stay
    silent (its gradients really flow, via finish_fused's gather)."""
    import warnings
    rp = demo_rp(32, 32)
    rp = dataclasses.replace(rp, transform=tf.reference_demo_transform(0.3))

    def loss_geom(m):
        fb = sr.render(dataclasses.replace(rp, transform=m))
        return jnp.sum(fb.color)

    with pytest.warns(UserWarning, match="stops those gradients"):
        g = jax.grad(loss_geom)(rp.transform)
    # The warned-about behavior: the geometry gradient really is zero.
    np.testing.assert_array_equal(np.asarray(g), 0.0)

    rp2 = scenes.config2_textured_cube(0.3, width=32, height=32)
    rp2 = dataclasses.replace(rp2, light=None)
    from software_renderer_tpu.ops.texture import Texture

    def loss_tex(tex_data):
        fb = sr.render(dataclasses.replace(
            rp2, texture=Texture(data=tex_data)))
        return jnp.sum(fb.color)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        g_tex = jax.grad(loss_tex)(rp2.texture.data)
    assert not any("stops those gradients" in str(w.message) for w in rec)
    assert float(jnp.abs(g_tex).sum()) > 0.0  # texture grads DO flow


@pytest.mark.parametrize("backend", ["reference", "auto"])
def test_texture_train_step_decreases_loss(backend):
    """'auto' is the shipped default: texture gradients through the
    PRODUCTION fused pipeline (finish_fused's gather), scanned frames,
    row-sharded, psum-ed over the mesh."""
    mesh = make_mesh(2, 4)
    rp = scenes.config2_textured_cube(0.3, width=32, height=32)
    rp = dataclasses.replace(rp, light=None)  # pure texture lookup
    transforms = batch_transforms(2)
    # Target: render with the true checkerboard.
    targets = render_batch(rp, transforms, backend="reference").color
    # Start from a gray texture; one step must reduce loss.
    tex0 = jnp.full_like(rp.texture.data, 0.5)
    tex1, loss0 = texture_train_step(tex0, rp, transforms, targets, mesh,
                                     lr=200.0, backend=backend)
    tex2, loss1 = texture_train_step(tex1, rp, transforms, targets, mesh,
                                     lr=200.0, backend=backend)
    assert float(loss1) < float(loss0)
    assert np.isfinite(np.asarray(tex2)).all()


def test_sharded_frontend_matches_replicated_fe():
    """shard_frontend=True (the default: FE split over the 'rows' axis +
    all_gather of the [T] columns) against shard_frontend=False (every
    shard recomputes the whole FE), on the production binned backend,
    with textures + perspective-correct attributes so the padded
    attribute columns are exercised (T=%d is not divisible by 4 shards,
    so the corner padding path runs)."""
    from software_renderer_tpu.ops.texture import Texture, checkerboard
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    mesh = sr.shapes.uv_sphere(radius=0.2, segments=9, rings=6,
                               inward_normals=True)
    assert (mesh.indices.shape[0] // 3) % 4 != 0  # padding path engaged
    rp = sr.RenderPass(mesh=mesh, transform=jnp.eye(4),
                       width=64, height=64, shading="textured",
                       texture=checkerboard(16, 4),
                       perspective_correct=True)
    dmesh = make_mesh(2, 4)
    transforms = batch_transforms(4)
    fb_sf = render_sharded(rp, transforms, dmesh, shard_frontend=True)
    fb_rep = render_sharded(rp, transforms, dmesh, shard_frontend=False)
    # Same backend, same per-shard shapes; only WHERE the FE columns were
    # computed differs — coverage must agree bit-exactly, color/depth up
    # to the cross-shape FE contraction class (XLA may contract the FE
    # FMAs differently at [T/4] vs [T] shapes on some hosts).
    np.testing.assert_array_equal(np.asarray(fb_sf.color[..., 3]),
                                  np.asarray(fb_rep.color[..., 3]))
    assert_tie_class_equal(fb_sf.color, fb_rep.color,
                           fb_sf.depth, fb_rep.depth,
                           atol=2e-4, context="sharded vs replicated FE")
