"""Native host runtime: C++ OBJ parsing + PNG encoding via ctypes.

Counterpart of the reference's native utility layer
(renderer/Metal+Extensions.swift) for the parts that remain host-side work
on TPU — asset ingestion and frame export. Built lazily with g++ on first
use; every entry point has a pure-Python fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sr_runtime.cpp")
_LIB = os.path.join(_HERE, "libsr_runtime.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB,
                     "-lz"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.sr_write_png.restype = ctypes.c_int
            lib.sr_write_png.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32]
            lib.sr_obj_load.restype = ctypes.c_void_p
            lib.sr_obj_load.argtypes = [ctypes.c_char_p]
            lib.sr_obj_counts.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.sr_obj_fill.argtypes = [ctypes.c_void_p] + [
                ctypes.c_void_p] * 4
            lib.sr_obj_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def write_png(path: str, image) -> None:
    """Native PNG encode; falls back to utils.image_io.write_png."""
    img = np.ascontiguousarray(image)
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.ndim not in (2, 3):
        from ..utils.image_io import write_png as py_write_png
        return py_write_png(path, img)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    rc = lib.sr_write_png(path.encode(), img.ctypes.data, w, h, c)
    if rc != 0:
        raise IOError(f"sr_write_png failed with code {rc}")


def read_png(path: str) -> np.ndarray:
    """PNG decode (pure-Python zlib path; see utils.image_io)."""
    from ..utils.image_io import read_png as py_read_png
    return py_read_png(path)


def load_obj(path: str, abs_normal_colors: bool = True):
    """Native OBJ load; falls back to models.obj.load_obj."""
    from ..models.mesh import mesh_from_numpy
    from ..models.obj import compute_vertex_normals, load_obj as py_load

    lib = _load()
    if lib is None:
        return py_load(path, abs_normal_colors=abs_normal_colors)
    handle = lib.sr_obj_load(path.encode())
    if not handle:
        raise IOError(f"cannot open OBJ file {path!r}")
    try:
        nv = ctypes.c_int32()
        ni = ctypes.c_int32()
        lib.sr_obj_counts(handle, ctypes.byref(nv), ctypes.byref(ni))
        positions = np.empty((nv.value, 3), np.float32)
        normals = np.empty((nv.value, 3), np.float32)
        uvs = np.empty((nv.value, 2), np.float32)
        indices = np.empty((ni.value,), np.int32)
        lib.sr_obj_fill(handle, positions.ctypes.data, normals.ctypes.data,
                        uvs.ctypes.data, indices.ctypes.data)
    finally:
        lib.sr_obj_free(handle)
    if ni.value == 0:
        # Mirror the Python fallback's contract (models/obj.py): a
        # readable file with no face data raises, never an empty mesh.
        raise ValueError(f"{path!r} contains no OBJ face data "
                         f"({nv.value} vertices, 0 faces)")
    if not np.any(normals):
        normals = compute_vertex_normals(positions,
                                         indices.reshape(-1, 3))
    colors = np.abs(normals) if abs_normal_colors else np.ones_like(positions)
    return mesh_from_numpy(positions, indices, colors=colors,
                           normals=normals, uvs=uvs)
