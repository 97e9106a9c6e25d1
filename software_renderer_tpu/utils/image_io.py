"""Image IO: dependency-free PNG and PPM writers.

The reference presents frames to an MTKView drawable (App.swift:103-105);
a headless TPU framework's presentation layer is files. PNG encoding uses
only the stdlib ``zlib``/``struct`` (no PIL in the image); a C++ native
encoder lives in runtime/ for bulk export.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(image, level: int = 6) -> bytes:
    """Encode an RGB(A) uint8 image [H, W, 3|4] (or grayscale [H, W]) to
    in-memory PNG bytes (the live present surface streams these)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 (use to_rgba8 first)")
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    payload = zlib.compress(raw, level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", payload) + _png_chunk(b"IEND", b""))


def write_png(path: str, image) -> None:
    """Write an RGB(A) uint8 image [H, W, 3|4] (or grayscale [H, W])."""
    with open(path, "wb") as f:
        f.write(encode_png(image))


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for our own writer's output (8-bit, no
    interlace, filter 0/1/2/3/4)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = channels = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bitd, ctype = struct.unpack(">IIBB", payload[:10])
            assert bitd == 8
            channels = {0: 1, 2: 3, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw[pos + 1:pos + 1 + stride],
                            np.uint8).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 2:  # up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                if ftype == 1:
                    cur[i] = (row[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (row[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    cur[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, channels)


def write_ppm(path: str, image) -> None:
    """Binary PPM (RGB only — alpha dropped)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        raise ValueError("write_ppm expects uint8")
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img[..., :3].tobytes())
