"""Procedural meshes (numpy at build time; arrays land on device once).

Replaces the reference's ModelIO mesh ingestion (renderer/App.swift:124-134
builds an ``MDLMesh`` UV sphere at process start and unpacks its
interleaved ``(x,y,z,nx,ny,nz,u,v)`` vertex buffer). Geometry construction
is host-side setup cost paid once, exactly like the reference's global
init (SURVEY.md call stack 3.1), so plain numpy is the right tool; render
time touches only the resulting device arrays.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh, mesh_from_numpy, merge_meshes, transform_mesh


def uv_sphere(radius: float = 0.2, segments: int = 13,
              rings: int | None = None, inward_normals: bool = False,
              abs_normal_colors: bool = True) -> Mesh:
    """UV sphere mirroring the reference's demo mesh.

    The reference builds ``MDLMesh(sphereWithExtent: .init(repeating: 0.4),
    segments: [13, 13], inwardNormals: true)`` and colors each vertex with
    ``abs(normal)`` (App.swift:124-133). ``extent`` is the full
    width/height/depth, so the radius is 0.2. Topology is the standard
    (segments x rings) latitude/longitude grid; pole quads degenerate into
    triangles and zero-area triangles are dropped.
    """
    rings = segments if rings is None else rings
    su, sv = segments, rings
    # Vertex grid: (sv+1) rows x (su+1) cols (seam duplicated for UVs).
    v_idx = np.arange(sv + 1)
    u_idx = np.arange(su + 1)
    phi = np.pi * v_idx / sv           # 0 (north pole) .. pi (south pole)
    theta = 2.0 * np.pi * u_idx / su
    sp, cp = np.sin(phi)[:, None], np.cos(phi)[:, None]
    st, ct = np.sin(theta)[None, :], np.cos(theta)[None, :]
    x = sp * ct
    y = cp * np.ones_like(st)
    z = sp * st
    unit = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    positions = radius * unit
    normals = -unit if inward_normals else unit
    uvs = np.stack(
        np.meshgrid(u_idx / su, v_idx / sv, indexing="xy"), axis=-1
    ).reshape(-1, 2)

    def vid(r, c):
        return r * (su + 1) + c

    tris = []
    for r in range(sv):
        for c in range(su):
            a, b = vid(r, c), vid(r, c + 1)
            cc, d = vid(r + 1, c), vid(r + 1, c + 1)
            if r > 0:           # top triangle of the quad
                tris.append([a, b, cc])
            if r < sv - 1:      # bottom triangle
                tris.append([b, d, cc])
    indices = np.asarray(tris, np.int32).reshape(-1)
    colors = np.abs(normals)  # App.swift:133
    return mesh_from_numpy(positions, indices, colors=colors,
                           normals=normals, uvs=uvs)


_BOX_FACES = [
    # (normal, corner axes) — +x, -x, +y, -y, +z, -z
    ((1, 0, 0), (0, 0, 1), (0, 1, 0)),
    ((-1, 0, 0), (0, 0, -1), (0, 1, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 0, 1)),
    ((0, -1, 0), (1, 0, 0), (0, 0, -1)),
    ((0, 0, 1), (-1, 0, 0), (0, 1, 0)),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0)),
]

_FACE_COLORS = np.array(
    [[1, 0, 0], [0, 1, 1], [0, 1, 0], [1, 0, 1], [0, 0, 1], [1, 1, 0]],
    np.float32,
)


def box(size=1.0, face_colors: bool = True) -> Mesh:
    """Axis-aligned box, 24 vertices (4 per face) / 12 triangles, with
    per-face normals, UVs, and optional distinct face colors
    (config 1/2 of BASELINE.json)."""
    half = np.broadcast_to(np.asarray(size, np.float64) / 2.0, (3,))
    positions, normals, uvs, colors, indices = [], [], [], [], []
    for f, (n, tu, tv) in enumerate(_BOX_FACES):
        n = np.asarray(n, np.float64)
        tu = np.asarray(tu, np.float64)
        tv = np.asarray(tv, np.float64)
        base = len(positions)
        for j, (du, dv) in enumerate([(-1, -1), (1, -1), (1, 1), (-1, 1)]):
            positions.append((n + du * tu + dv * tv) * half)
            normals.append(n)
            uvs.append(((du + 1) / 2, (dv + 1) / 2))
            colors.append(_FACE_COLORS[f] if face_colors
                          else np.abs(n).astype(np.float32))
        indices += [base, base + 1, base + 2, base, base + 2, base + 3]
    return mesh_from_numpy(np.asarray(positions), np.asarray(indices),
                           colors=np.asarray(colors),
                           normals=np.asarray(normals),
                           uvs=np.asarray(uvs))


def plane(size=1.0) -> Mesh:
    h = float(size) / 2.0
    positions = np.array(
        [[-h, 0, -h], [h, 0, -h], [h, 0, h], [-h, 0, h]], np.float32)
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    colors = np.ones((4, 3), np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.int32)
    return mesh_from_numpy(positions, indices, colors=colors,
                           normals=normals, uvs=uvs)


def torus(major_radius=0.3, minor_radius=0.12, segments_u=48,
          segments_v=24) -> Mesh:
    """Torus — a ~5k-triangle smooth benchmark mesh for Phong shading
    (stand-in for the teapot/bunny of BASELINE.json config 3 when no OBJ
    file is available; models/obj.py loads real OBJ assets)."""
    su, sv = segments_u, segments_v
    iu = np.arange(su + 1)
    iv = np.arange(sv + 1)
    theta = 2 * np.pi * iu / su  # around the main ring
    phi = 2 * np.pi * iv / sv    # around the tube
    ct, st = np.cos(theta)[:, None], np.sin(theta)[:, None]
    cp, sp = np.cos(phi)[None, :], np.sin(phi)[None, :]
    cx = (major_radius + minor_radius * cp) * ct
    cy = minor_radius * sp * np.ones_like(ct)
    cz = (major_radius + minor_radius * cp) * st
    positions = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
    nx = cp * ct
    ny = sp * np.ones_like(ct)
    nz = cp * st
    normals = np.stack([nx, ny, nz], axis=-1).reshape(-1, 3)
    uvs = np.stack(np.meshgrid(iv / sv, iu / su, indexing="xy"),
                   axis=-1).reshape(-1, 2)
    tris = []
    for r in range(su):
        for c in range(sv):
            a = r * (sv + 1) + c
            b = a + 1
            cc = a + (sv + 1)
            d = cc + 1
            tris += [[a, b, cc], [b, d, cc]]
    colors = np.abs(normals)
    return mesh_from_numpy(positions, np.asarray(tris, np.int32).reshape(-1),
                           colors=colors, normals=normals, uvs=uvs)


def many_objects_scene(target_triangles: int = 100_000, seed: int = 0,
                       extent: float = 1.6) -> Mesh:
    """A large multi-mesh scene (BASELINE.json config 4: ~100k triangles):
    randomly placed, rotated, scaled, and tinted spheres/boxes/tori baked
    into one struct-of-arrays mesh (single draw, single vertex matmul).

    Instancing is done entirely in numpy at build time — like the
    reference's global-scope mesh load (App.swift:124-134), scene
    construction is a one-time host cost, never on the render path.
    """
    rng = np.random.default_rng(seed)
    protos = [uv_sphere(radius=0.5, segments=10),
              box(size=1.0, face_colors=False),
              torus(major_radius=0.5, minor_radius=0.2,
                    segments_u=12, segments_v=8)]
    protos_np = [
        (np.asarray(p.positions), np.asarray(p.normals),
         np.asarray(p.colors), np.asarray(p.uvs), np.asarray(p.indices))
        for p in protos
    ]
    positions, normals, colors, uvs, indices = [], [], [], [], []
    total = 0
    offset = 0
    while total < target_triangles:
        ppos, pnrm, pcol, puv, pidx = protos_np[rng.integers(len(protos))]
        ntris = pidx.shape[0] // 3
        if total + ntris > target_triangles and total > 0:
            break
        scale = rng.uniform(0.03, 0.10)
        center = rng.uniform(-extent / 2, extent / 2, size=3)
        center[2] = rng.uniform(0.1, 0.9)  # keep in front of the camera
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))  # random rotation
        tint = rng.uniform(0.3, 1.0, size=3).astype(np.float32)
        positions.append(ppos @ (q.T * scale) + center)
        normals.append(pnrm @ q.T)  # pure rotation: normals rotate with q
        colors.append(pcol * tint)
        uvs.append(puv)
        indices.append(pidx + offset)
        offset += ppos.shape[0]
        total += ntris
    return mesh_from_numpy(
        np.concatenate(positions).astype(np.float32),
        np.concatenate(indices),
        colors=np.concatenate(colors),
        normals=np.concatenate(normals).astype(np.float32),
        uvs=np.concatenate(uvs),
    )
