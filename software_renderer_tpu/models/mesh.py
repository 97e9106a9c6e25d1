"""Mesh: struct-of-arrays geometry container.

The reference stores an array-of-structs ``[Vertex]`` (NDC position + RGB
color, renderer/Renderer.swift:154-172) plus a flat index list
(RenderPass at Renderer.swift:191-200). The TPU-native layout is
struct-of-arrays so every pipeline stage is a batched tensor op: positions
feed one MXU matmul (ops/vertex.py), attributes feed vectorized gathers in
the resolve stage.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Mesh:
    """Indexed triangle (or line/point) mesh.

    positions: [N, 3] float32 model-space positions.
    indices:   [M] int32 flat index list — interpreted per primitive type
               (3 per triangle, 2 per line, 1 per point), mirroring the
               reference's ``RenderPass.indices`` (Renderer.swift:195-197).
    colors / normals / uvs: optional per-vertex attributes.
    """

    positions: jax.Array
    indices: jax.Array
    colors: Optional[jax.Array] = None
    normals: Optional[jax.Array] = None
    uvs: Optional[jax.Array] = None

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    def triangles(self) -> jax.Array:
        """[T, 3] triangle index array."""
        m = self.indices.shape[0]
        assert m % 3 == 0, "triangle index count must be a multiple of 3"
        return self.indices.reshape(m // 3, 3)

    def lines(self) -> jax.Array:
        m = self.indices.shape[0]
        assert m % 2 == 0, "line index count must be a multiple of 2"
        return self.indices.reshape(m // 2, 2)


def mesh_from_numpy(positions, indices, colors=None, normals=None,
                    uvs=None) -> Mesh:
    as_f32 = lambda a: None if a is None else jnp.asarray(
        np.asarray(a), jnp.float32)
    return Mesh(
        positions=jnp.asarray(np.asarray(positions), jnp.float32),
        indices=jnp.asarray(np.asarray(indices), jnp.int32).reshape(-1),
        colors=as_f32(colors),
        normals=as_f32(normals),
        uvs=as_f32(uvs),
    )


def merge_meshes(meshes) -> Mesh:
    """Concatenate meshes into one draw (index offsets applied).

    Attributes present in any input are filled with defaults in the rest
    (colors -> 1, normals -> +z, uvs -> 0).
    """
    any_colors = any(m.colors is not None for m in meshes)
    any_normals = any(m.normals is not None for m in meshes)
    any_uvs = any(m.uvs is not None for m in meshes)
    positions, indices, colors, normals, uvs = [], [], [], [], []
    offset = 0
    for m in meshes:
        n = m.num_vertices
        positions.append(m.positions)
        indices.append(m.indices + offset)
        if any_colors:
            colors.append(m.colors if m.colors is not None
                          else jnp.ones((n, 3), jnp.float32))
        if any_normals:
            normals.append(
                m.normals if m.normals is not None
                else jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32),
                              (n, 1)))
        if any_uvs:
            uvs.append(m.uvs if m.uvs is not None
                       else jnp.zeros((n, 2), jnp.float32))
        offset += n
    cat = lambda xs: jnp.concatenate(xs, axis=0) if xs else None
    return Mesh(positions=cat(positions), indices=cat(indices),
                colors=cat(colors), normals=cat(normals), uvs=cat(uvs))


def transform_mesh(mesh: Mesh, matrix) -> Mesh:
    """Bake a 4x4 transform into positions (and rotate normals)."""
    m = jnp.asarray(matrix, jnp.float32)
    pos = mesh.positions @ m[:3, :3].T + m[:3, 3]
    normals = mesh.normals
    if normals is not None:
        from ..ops.transforms import inverse_transpose_3x3
        # n' = n @ inv(rot) == n @ inverse-transpose(rot).T (adjugate form
        # keeps XLA's general LU inverse out of jitted mesh updates).
        normals = normals @ inverse_transpose_3x3(m[:3, :3]).T
        norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / jnp.maximum(norm, 1e-12)
    return dataclasses.replace(mesh, positions=pos, normals=normals)
