"""Geometry: Mesh container, procedural shapes, OBJ loading, demo scenes."""

from .mesh import Mesh, mesh_from_numpy, merge_meshes, transform_mesh
