"""Demo scenes: the reference's live scene + legacy demos + the graded
benchmark configs of BASELINE.json.

Each scene is a function ``(time) -> RenderPass`` (plus static size
options), mirroring the reference's per-frame RenderPass assembly in
``rendererApp.render`` (renderer/App.swift:153-188) and its three legacy
demos (rotationTriangleExample :190, cubeExample :206, trianglesExample
:284). Time-dependent transforms are pure jnp, so scenes can be vmapped
over time for batched rendering (config 5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import transforms as tf
from ..ops.shading import Light
from ..ops.texture import checkerboard
from ..render import RenderPass
from . import shapes
from .mesh import mesh_from_numpy


def reference_sphere(time, width: int = 512, height: int = 512,
                     backend_shading: str = "vertex") -> RenderPass:
    """The reference's live demo scene (App.swift:124-185): 13x13 UV
    sphere with inward normals and abs(normal) colors, two composed
    rotations, translate z=+1, scale 2, projection w = z + 1."""
    mesh = shapes.uv_sphere(radius=0.2, segments=13, inward_normals=True)
    return RenderPass(
        mesh=mesh,
        transform=tf.reference_demo_transform(time),
        width=width, height=height, shading=backend_shading,
    )


def rotating_triangle(time, width: int = 512, height: int = 512) -> RenderPass:
    """rotationTriangleExample (App.swift:190-204): one triangle spinning
    about the screen center, expressed in NDC instead of raw pixels."""
    positions = jnp.array(
        [[0.0, 0.5, 0.5], [-0.5, 0.0, 0.5], [0.5, -0.5, 0.5]], jnp.float32)
    colors = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    q = tf.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                                jnp.asarray(time, jnp.float32))
    from .mesh import Mesh
    mesh = Mesh(positions=positions,
                indices=jnp.array([0, 1, 2], jnp.int32), colors=colors)
    return RenderPass(mesh=mesh, transform=tf.rotation_matrix(q),
                      width=width, height=height, shading="vertex")


_CUBE_EDGES = np.array([
    [0, 1], [1, 3], [3, 2], [2, 0],   # back face
    [4, 5], [5, 7], [7, 6], [6, 4],   # front face
    [0, 4], [1, 5], [2, 6], [3, 7],   # connectors
], np.int32)


def wireframe_cube(time, width: int = 512, height: int = 512) -> RenderPass:
    """cubeExample (App.swift:206-282): spinning wireframe cube of 12 line
    segments, two composed rotations."""
    corners = np.array(
        [[x, y, z] for z in (-0.5, 0.5) for y in (-0.5, 0.5)
         for x in (-0.5, 0.5)], np.float32)
    mesh = mesh_from_numpy(corners, _CUBE_EDGES.reshape(-1),
                           colors=np.tile(np.array([[0.0, 1.0, 0.0]]),
                                          (8, 1)))
    t = jnp.asarray(time, jnp.float32)
    qy = tf.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                 t * 0.5)
    qx = tf.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0], jnp.float32),
                                 t * 0.1 + 1.2)
    model = tf.trs_matrix(translation=(0.0, 0.0, 1.0),
                          rotation=tf.quat_mul(qy, qx),
                          scale=(1.2, 1.2, 1.2))
    return RenderPass(mesh=mesh,
                      transform=tf.reference_projection() @ model,
                      width=width, height=height, primitive="line")


def intersecting_triangles(time, width: int = 512, height: int = 512
                           ) -> RenderPass:
    """trianglesExample (App.swift:284-342): two interpenetrating
    triangles exercising the depth buffer; one rotates about y."""
    positions = np.array([
        [0.0, 0.6, 0.5], [0.6, -0.6, 0.5], [-0.6, -0.6, 0.5],
        [0.0, 0.6, 0.5], [0.0, -0.6, 0.25], [0.0, -0.6, 0.75],
    ], np.float32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]] * 2, np.float32)
    mesh = mesh_from_numpy(positions, np.arange(6, dtype=np.int32),
                           colors=colors)
    t = jnp.asarray(time, jnp.float32)
    q = tf.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                t * 0.5)
    model = tf.trs_matrix(translation=(0.0, 0.0, 0.3), rotation=q)
    return RenderPass(mesh=mesh, transform=model,
                      width=width, height=height, shading="vertex")


# ---------------------------------------------------------------------------
# BASELINE.json graded configs
# ---------------------------------------------------------------------------

def config1_flat_cube(time, width: int = 256, height: int = 256) -> RenderPass:
    """Config 1: single flat-shaded rotating cube at 256^2."""
    mesh = shapes.box(size=0.8, face_colors=True)
    t = jnp.asarray(time, jnp.float32)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t)
    model = tf.trs_matrix(translation=(0.0, 0.0, 1.0), rotation=q)
    return RenderPass(mesh=mesh,
                      transform=tf.reference_projection() @ model,
                      width=width, height=height, shading="vertex")


def config2_textured_cube(time, width: int = 512, height: int = 512
                          ) -> RenderPass:
    """Config 2: textured cube, z-buffer + backface culling at 512^2."""
    mesh = shapes.box(size=0.8, face_colors=False)
    t = jnp.asarray(time, jnp.float32)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 2.0, 0.5], jnp.float32)), t)
    model = tf.trs_matrix(translation=(0.0, 0.0, 1.0), rotation=q)
    return RenderPass(mesh=mesh,
                      transform=tf.reference_projection() @ model,
                      width=width, height=height, shading="textured",
                      texture=checkerboard(128, 8), cull_backfaces=True,
                      light=Light.default(), model=model)


def _teapot_mesh():
    """The Utah teapot for config 3: loaded from the checked-in
    assets/teapot.obj through the real OBJ path (native C++ parser with
    Python fallback, models/obj.py); regenerated from the Newell patches
    (models/teapot.py) if the asset is missing."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..", "assets", "teapot.obj")
    if os.path.exists(path):
        from .obj import load_obj
        return load_obj(path)
    from .mesh import mesh_from_numpy
    from .teapot import teapot_mesh
    import numpy as np
    p, t, n, uv = teapot_mesh(9)
    return mesh_from_numpy(p, t.reshape(-1), colors=np.abs(n), normals=n,
                           uvs=uv)


def config3_phong_mesh(time, width: int = 1024, height: int = 1024
                       ) -> RenderPass:
    """Config 3: the Utah teapot OBJ (~5k tris), per-pixel Phong at
    1024^2 (BASELINE.json configs[2]; cf. the reference's mesh ingestion
    at App.swift:124-134)."""
    mesh = _teapot_mesh()
    t = jnp.asarray(time, jnp.float32)
    q = tf.quat_from_axis_angle(
        tf.normalize(jnp.array([1.0, 0.7, 0.2], jnp.float32)), t)
    model = tf.trs_matrix(translation=(0.0, 0.0, 1.0), rotation=q,
                          scale=(1.5, 1.5, 1.5))
    return RenderPass(mesh=mesh,
                      transform=tf.reference_projection() @ model,
                      width=width, height=height, shading="phong",
                      light=Light.default(), model=model)


def config4_many_objects(time, width: int = 1920, height: int = 1080,
                         triangles: int = 100_000, textured: bool = True
                         ) -> RenderPass:
    """Config 4: 100k-triangle multi-mesh scene, Phong + bilinear textures
    at 1920x1080 (the north-star scene)."""
    mesh = shapes.many_objects_scene(target_triangles=triangles)
    t = jnp.asarray(time, jnp.float32)
    q = tf.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                t * 0.3)
    model = tf.trs_matrix(translation=(0.0, 0.0, 0.4), rotation=q)
    return RenderPass(
        mesh=mesh, transform=tf.reference_projection() @ model,
        width=width, height=height,
        shading="textured" if textured else "phong",
        texture=checkerboard(256, 16) if textured else None,
        light=Light.default(), model=model, cull_backfaces=True,
    )
