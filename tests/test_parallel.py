"""Batched (vmap) and sharded (shard_map over a virtual 8-device CPU mesh)
rendering, plus the texture-optimization training step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

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
    rp = demo_rp()
    t = tf.reference_demo_transform(0.4)
    rp = dataclasses.replace(rp, transform=t)
    from software_renderer_tpu.render import render_rows
    full = sr.render(rp, backend="reference")
    top = render_rows(rp, y_start=0, rows=32, backend="reference")
    bot = render_rows(rp, y_start=32, rows=32, backend="reference")
    color = np.concatenate([np.asarray(top.color), np.asarray(bot.color)])
    depth = np.concatenate([np.asarray(top.depth), np.asarray(bot.depth)])
    bad_c = ~np.isclose(np.asarray(full.color), color, atol=1e-6)
    bad_d = ~np.isclose(np.asarray(full.depth), depth, atol=1e-6)
    assert bad_c.any(axis=-1).mean() < 0.005
    assert bad_d.mean() < 0.005


def test_sharded_render_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(2, 4)
    rp = demo_rp()
    transforms = batch_transforms(4)  # 2 frames per shard
    fb = render_sharded(rp, transforms, mesh, backend="reference")
    assert fb.color.shape == (4, 64, 64, 4)
    # Equality vs unsharded batch (up to FMA-codegen ulps flipping depth
    # ties at shared edges, see test_row_slicing_exact).
    fb_ref = render_batch(rp, transforms, backend="reference")
    bad_c = ~np.isclose(np.asarray(fb.color), np.asarray(fb_ref.color),
                        atol=1e-6)
    bad_d = ~np.isclose(np.asarray(fb.depth), np.asarray(fb_ref.depth),
                        atol=1e-6)
    assert bad_c.any(axis=-1).mean() < 0.005
    assert bad_d.mean() < 0.005


def test_texture_train_step_decreases_loss():
    mesh = make_mesh(2, 4)
    rp = scenes.config2_textured_cube(0.3, width=32, height=32)
    rp = dataclasses.replace(rp, light=None)  # pure texture lookup
    transforms = batch_transforms(2)
    # Target: render with the true checkerboard.
    targets = render_batch(rp, transforms, backend="reference").color
    # Start from a gray texture; one step must reduce loss.
    tex0 = jnp.full_like(rp.texture.data, 0.5)
    tex1, loss0 = texture_train_step(tex0, rp, transforms, targets, mesh,
                                     lr=200.0)
    tex2, loss1 = texture_train_step(tex1, rp, transforms, targets, mesh,
                                     lr=200.0)
    assert float(loss1) < float(loss0)
    assert np.isfinite(np.asarray(tex2)).all()
