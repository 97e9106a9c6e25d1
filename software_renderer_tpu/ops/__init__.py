"""Compute ops: vertex transforms, triangle setup, rasterization kernels,
resolve/shading, textures, lines/points, 2D primitives."""
