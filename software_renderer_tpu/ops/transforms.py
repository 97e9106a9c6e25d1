"""Transform math: quaternions, TRS matrices, projections.

Counterpart of the reference's use of simd quaternions / RealityKit
``Transform`` (renderer/App.swift:169-183) and the projection derivation in
3d.md. All functions are pure jnp, batched-friendly, and jit-safe.

Conventions (matching the reference):
* Column-vector convention: ``clip = M @ [x, y, z, 1]``.
* NDC: x, y in [-1, 1], z in [0, 1] (Renderer.swift:155).
* The default demo projection is ``w = z + 1`` (App.swift:176-181): an eye
  at (0, 0, -1) looking down +z.
* RealityKit ``Transform.matrix`` composes translation * rotation * scale;
  we mirror that in :func:`trs_matrix`.
"""

from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------------------
# Quaternions (x, y, z, w) layout; simd_quatf uses (ix, iy, iz, r).
# --------------------------------------------------------------------------

def quat_from_axis_angle(axis, angle):
    """Unit quaternion for rotation of `angle` radians about `axis`.

    Matches ``simd_quatf(angle:axis:)`` (App.swift:170-171). `axis` must be
    normalized by the caller if not already (the reference normalizes).
    """
    axis = jnp.asarray(axis, dtype=jnp.float32)
    half = jnp.asarray(angle, dtype=jnp.float32) / 2.0
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)[None]], axis=-1)


def quat_mul(q1, q2):
    """Hamilton product q1 * q2 (apply q2 first, then q1) — matches
    ``rotation *= q`` composition at App.swift:170-171."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def inverse_transpose_3x3(m):
    """Closed-form adjugate inverse-transpose of a 3x3 (the normal matrix).

    inv(M).T == adj(M).T / det(M); the scale factor is irrelevant for
    normals (they are renormalized per pixel), but dividing by det keeps
    magnitudes sane for reuse. Closed form keeps the frame loop free of
    XLA's general LU path."""
    m = jnp.asarray(m, jnp.float32)
    c0 = jnp.cross(m[:, 1], m[:, 2])
    c1 = jnp.cross(m[:, 2], m[:, 0])
    c2 = jnp.cross(m[:, 0], m[:, 1])
    det = jnp.dot(m[:, 0], c0)
    adj_t = jnp.stack([c0, c1, c2], axis=1)  # columns = cofactor columns
    return adj_t / jnp.where(det == 0.0, 1.0, det)


# --------------------------------------------------------------------------
# 4x4 matrices
# --------------------------------------------------------------------------

def identity():
    return jnp.eye(4, dtype=jnp.float32)


def translation_matrix(t):
    t = jnp.asarray(t, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(t)


def scale_matrix(s):
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def rotation_matrix(q):
    """Quaternion -> homogeneous 4x4."""
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(quat_to_matrix(q))


def trs_matrix(translation=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0, 1.0),
               scale=(1.0, 1.0, 1.0)):
    """RealityKit ``Transform.matrix`` semantics: T @ R @ S
    (App.swift:169-183)."""
    return translation_matrix(translation) @ rotation_matrix(
        jnp.asarray(rotation, jnp.float32)
    ) @ scale_matrix(scale)


def reference_projection():
    """The reference demo projection: w = z + 1 (App.swift:176-181,
    derivation in 3d.md). Eye at (0,0,-1), NDC xy scaled by 1/(z+1)."""
    return jnp.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0, 1.0],
        ],
        dtype=jnp.float32,
    )


def perspective(fov_y, aspect, z_near, z_far):
    """Standard perspective projection mapping view z in [-near, -far]
    (right-handed, looking down -z) to NDC z in [0, 1] (the reference's NDC
    depth convention, Renderer.swift:155)."""
    f = 1.0 / jnp.tan(jnp.asarray(fov_y, jnp.float32) / 2.0)
    a = z_far / (z_near - z_far)
    b = z_far * z_near / (z_near - z_far)
    return jnp.array(
        [
            [f / aspect, 0.0, 0.0, 0.0],
            [0.0, f, 0.0, 0.0],
            [0.0, 0.0, a, b],
            [0.0, 0.0, -1.0, 0.0],
        ],
        dtype=jnp.float32,
    )


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """Right-handed view matrix (camera looks down -z in view space)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = normalize(target - eye)
    right = normalize(jnp.cross(fwd, up))
    true_up = jnp.cross(right, fwd)
    rot = jnp.stack([right, true_up, -fwd], axis=0)  # [3,3]
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    return m.at[:3, 3].set(-rot @ eye)


def project_ndc_to_uv(p):
    """Legacy NDC -> uv projection (Renderer.swift:131-152 ``project``).

    The reference's live implementation returns ``p.xy`` unconditionally
    (Renderer.swift:133) — the perspective-by-1/(z+1) code after it is
    dead. The working equivalent of its intent: scale xy by 1/(z+1) (eye
    at (0,0,-1)) and shift to uv space. Both behaviors are offered.
    """
    p = jnp.asarray(p, jnp.float32)
    scale = 1.0 / (p[..., 2] + 1.0)
    return p[..., :2] * scale[..., None] + 0.5


def project_ndc_to_uv_literal(p):
    """Bug-compatible variant: returns p.xy exactly as the reference's
    early-return does (Renderer.swift:133)."""
    return jnp.asarray(p, jnp.float32)[..., :2]


def reference_demo_transform(time):
    """The exact per-frame MVP of the reference's live scene
    (App.swift:169-183): two composed quaternion rotations, translate z=+1,
    uniform scale 2, then the w=z+1 projection."""
    time = jnp.asarray(time, jnp.float32)
    q1 = quat_from_axis_angle(
        normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), time
    )
    q2 = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0], jnp.float32), time * 0.5)
    rotation = quat_mul(q1, q2)
    model = trs_matrix(
        translation=(0.0, 0.0, 1.0), rotation=rotation, scale=(2.0, 2.0, 2.0)
    )
    return reference_projection() @ model
