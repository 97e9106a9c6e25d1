"""Wavefront OBJ loading (BASELINE.json config 3: teapot/bunny-class
meshes).

The reference ingests geometry through ModelIO/RealityKit
(renderer/App.swift:124-134, RealityKit+Extensions.swift:11-27); a
headless TPU framework loads standard OBJ files instead. Pure-python
parser, numpy assembly; faces are fan-triangulated, v/vt/vn index triplets
are deduplicated into a unified vertex array. Vertex colors default to
abs(normal) — the reference's coloring rule (App.swift:133).
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh, mesh_from_numpy


def load_obj(path: str, abs_normal_colors: bool = True) -> Mesh:
    positions, uvs, normals = [], [], []
    out_pos, out_uv, out_nrm, tri_indices = [], [], [], []
    dedup: dict[tuple, int] = {}

    def vertex_for(token: str) -> int:
        parts = token.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = ni = None
        if len(parts) > 1 and parts[1]:
            t = int(parts[1])
            ti = t - 1 if t > 0 else len(uvs) + t
        if len(parts) > 2 and parts[2]:
            n = int(parts[2])
            ni = n - 1 if n > 0 else len(normals) + n
        # Dedup on the *resolved* (v, vt, vn) triple, not the raw token:
        # negative (relative) indices resolve differently as more v/vt/vn
        # records stream in, so the same token can mean different corners.
        key = (vi, ti, ni)
        if key in dedup:
            return dedup[key]
        if not (0 <= vi < len(positions)):
            raise IndexError(f"OBJ face index {parts[0]!r} out of range "
                             f"({len(positions)} vertices so far)")
        if ti is not None and not (0 <= ti < len(uvs)):
            raise IndexError(f"OBJ uv index {parts[1]!r} out of range")
        if ni is not None and not (0 <= ni < len(normals)):
            raise IndexError(f"OBJ normal index {parts[2]!r} out of range")
        idx = len(out_pos)
        dedup[key] = idx
        out_pos.append(positions[vi])
        out_uv.append(uvs[ti] if ti is not None else (0.0, 0.0))
        out_nrm.append(normals[ni] if ni is not None else (0.0, 0.0, 0.0))
        return idx

    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tag, *rest = line.split()
            if tag == "v":
                positions.append(tuple(float(x) for x in rest[:3]))
            elif tag == "vt":
                u = float(rest[0])
                v = float(rest[1]) if len(rest) > 1 else 0.0
                uvs.append((u, v))
            elif tag == "vn":
                normals.append(tuple(float(x) for x in rest[:3]))
            elif tag == "f":
                corner_ids = [vertex_for(tok) for tok in rest]
                for k in range(1, len(corner_ids) - 1):  # fan triangulation
                    tri_indices += [corner_ids[0], corner_ids[k],
                                    corner_ids[k + 1]]

    if not tri_indices:
        # A readable file that yields no geometry (wrong format, or an
        # OBJ with no faces) must fail HERE with a clear message, not
        # propagate an empty mesh into rendering.
        raise ValueError(f"{path!r} contains no OBJ face data "
                         f"({len(positions)} vertices, 0 faces)")
    pos = np.asarray(out_pos, np.float32)
    nrm = np.asarray(out_nrm, np.float32)
    if not normals or not np.any(nrm):
        nrm = compute_vertex_normals(pos, np.asarray(tri_indices,
                                                     np.int64).reshape(-1, 3))
    uv = np.asarray(out_uv, np.float32)
    colors = np.abs(nrm) if abs_normal_colors else np.ones_like(pos)
    return mesh_from_numpy(pos, np.asarray(tri_indices, np.int64),
                           colors=colors, normals=nrm, uvs=uv)


def compute_vertex_normals(positions: np.ndarray,
                           tris: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (for OBJ files without vn records)."""
    v0 = positions[tris[:, 0]]
    v1 = positions[tris[:, 1]]
    v2 = positions[tris[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted
    normals = np.zeros_like(positions)
    for c in range(3):
        np.add.at(normals, tris[:, c], fn)
    lens = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.maximum(lens, 1e-12)).astype(np.float32)


def save_obj(path: str, mesh: Mesh) -> None:
    """Minimal OBJ export (round-trip testing, asset interchange)."""
    pos = np.asarray(mesh.positions)
    tris = np.asarray(mesh.indices).reshape(-1, 3) + 1
    with open(path, "w") as f:
        for p in pos:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if mesh.uvs is not None:
            for t in np.asarray(mesh.uvs):
                f.write(f"vt {t[0]} {t[1]}\n")
        if mesh.normals is not None:
            for n in np.asarray(mesh.normals):
                f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        has_t = mesh.uvs is not None
        has_n = mesh.normals is not None
        for a, b, c in tris:
            if has_t and has_n:
                f.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")
            elif has_n:
                f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")
            else:
                f.write(f"f {a} {b} {c}\n")
