import numpy as np
import jax.numpy as jnp

from software_renderer_tpu.ops import transforms as tf


def test_quat_identity():
    q = tf.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.0)
    np.testing.assert_allclose(tf.quat_to_matrix(q), np.eye(3), atol=1e-6)


def test_quat_z_rotation():
    q = tf.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 2)
    m = tf.quat_to_matrix(q)
    # Rotating +x by 90deg about +z gives +y.
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]),
                               np.array([0, 1.0, 0]), atol=1e-6)


def test_quat_mul_composition():
    qa = tf.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.3)
    qb = tf.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.7)
    m = tf.quat_to_matrix(tf.quat_mul(qa, qb))
    np.testing.assert_allclose(
        m, np.asarray(tf.quat_to_matrix(qa)) @ np.asarray(tf.quat_to_matrix(qb)),
        atol=1e-6)


def test_trs_order():
    # T @ R @ S: scale first, then rotate, then translate.
    q = tf.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 2)
    m = tf.trs_matrix(translation=(1.0, 2.0, 3.0), rotation=q,
                      scale=(2.0, 2.0, 2.0))
    p = m @ jnp.array([1.0, 0.0, 0.0, 1.0])
    # scale -> (2,0,0); rotate 90 about z -> (0,2,0); translate -> (1,4,3).
    np.testing.assert_allclose(p[:3], np.array([1.0, 4.0, 3.0]), atol=1e-5)


def test_reference_projection_w_equals_z_plus_1():
    m = tf.reference_projection()
    p = m @ jnp.array([0.3, -0.2, 0.5, 1.0])
    np.testing.assert_allclose(p[3], 1.5, atol=1e-6)  # w = z + 1
    np.testing.assert_allclose(p[:3], np.array([0.3, -0.2, 0.5]), atol=1e-6)


def test_perspective_depth_range():
    m = tf.perspective(np.pi / 3, 1.0, 0.1, 100.0)
    for z, expect in [(-0.1, 0.0), (-100.0, 1.0)]:
        clip = m @ jnp.array([0.0, 0.0, z, 1.0])
        ndc_z = clip[2] / clip[3]
        np.testing.assert_allclose(ndc_z, expect, atol=1e-5)


def test_look_at_identityish():
    m = tf.look_at(eye=(0.0, 0.0, 0.0), target=(0.0, 0.0, -1.0))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_reference_demo_transform_shape():
    m = tf.reference_demo_transform(0.5)
    assert m.shape == (4, 4)
    assert bool(jnp.all(jnp.isfinite(m)))
