"""Utility layers: image IO (python + native), config, checkpoint, OBJ,
pixel-format conversion, native runtime parity."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import software_renderer_tpu as sr
from software_renderer_tpu import runtime
from software_renderer_tpu.models.obj import (compute_vertex_normals,
                                              load_obj, save_obj)
from software_renderer_tpu.utils.checkpoint import (load_checkpoint,
                                                    save_checkpoint)
from software_renderer_tpu.utils.config import RenderConfig
from software_renderer_tpu.utils.image_io import read_png, write_png


def test_quantize_roundtrip():
    c = jnp.array([[[0.0, 0.5, 1.0, 1.0], [1.5, -0.2, 0.25, 0.0]]])
    rgba = np.asarray(sr.to_rgba8(c))
    np.testing.assert_array_equal(rgba[0, 0], [0, 128, 255, 255])
    np.testing.assert_array_equal(rgba[0, 1], [255, 0, 64, 0])  # clamped
    bgra = np.asarray(sr.to_bgra8(c))
    np.testing.assert_array_equal(bgra[0, 0], [255, 128, 0, 255])


def test_pixel_format_registry():
    """Every registered format round-trips RGBA within its quantization
    step (Metal+Extensions.swift:511-595's format metadata, as a table)."""
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.random((4, 5, 4)), jnp.float32)
    steps = {"rgba8": 1 / 255, "bgra8": 1 / 255, "rgb565": 1 / 31,
             "gray8": None, "rgba16f": 1e-3, "rgba32f": 0.0, "r32f": None}
    for fmt, (bpp, chans, _, _) in sr.PIXEL_FORMATS.items():
        raw = sr.encode_pixels(c, fmt)
        assert sr.bytes_per_pixel(fmt) == bpp
        back = np.asarray(sr.decode_pixels(raw, fmt))
        assert back.shape == c.shape
        step = steps[fmt]
        if step is None:
            continue  # lossy beyond per-channel quantization (gray/r32f)
        k = chans if chans < 4 else 4
        np.testing.assert_allclose(back[..., :k], np.asarray(c)[..., :k],
                                   atol=step / 2 + 1e-6)
    # rgb565 packs to uint16 with documented bit layout
    raw = np.asarray(sr.encode_pixels(
        jnp.array([[1.0, 0.0, 0.0, 1.0]]), "rgb565"))
    assert raw.dtype == np.uint16 and raw[0] == 0b11111_000000_00000
    # gray8 applies Rec.601 luma
    g = np.asarray(sr.encode_pixels(jnp.array([[0.0, 1.0, 0.0, 1.0]]),
                                    "gray8"))
    assert g[0] == round(0.587 * 255)
    with pytest.raises(ValueError):
        sr.encode_pixels(c, "nope")


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(33, 47, 4), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_native_png_matches_python(tmp_path):
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "n.png")
    runtime.write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_obj_roundtrip(tmp_path):
    mesh = sr.shapes.box(1.0)
    p = str(tmp_path / "box.obj")
    save_obj(p, mesh)
    back = load_obj(p)
    np.testing.assert_allclose(np.asarray(back.positions),
                               np.asarray(mesh.positions), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(back.indices),
                                  np.asarray(mesh.indices))
    np.testing.assert_allclose(np.asarray(back.uvs),
                               np.asarray(mesh.uvs), atol=1e-5)
    if runtime.available():
        native = runtime.load_obj(p)
        np.testing.assert_allclose(np.asarray(native.positions),
                                   np.asarray(back.positions), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(native.indices),
                                      np.asarray(back.indices))


def test_obj_no_geometry_raises(tmp_path):
    """A readable file with no OBJ face data must raise a clear error
    (never return an empty mesh), in BOTH loaders — the Python parser
    and the C++ runtime path share the contract."""
    p = str(tmp_path / "not_an.obj")
    with open(p, "w") as f:
        f.write("# comment only\nroot:x:0:0:/root\n")
    with pytest.raises(ValueError, match="no OBJ face data"):
        load_obj(p)
    if runtime.available():
        with pytest.raises(ValueError, match="no OBJ face data"):
            runtime.load_obj(p)
    # vertices but no faces is still no geometry
    p2 = str(tmp_path / "pts.obj")
    with open(p2, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
    with pytest.raises(ValueError, match="no OBJ face data"):
        load_obj(p2)


def test_obj_computed_normals(tmp_path):
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]])
    n = compute_vertex_normals(positions, tris)
    np.testing.assert_allclose(n, np.tile([[0, 0, 1]], (3, 1)), atol=1e-6)


def test_config_json_roundtrip(tmp_path):
    cfg = RenderConfig(width=1920, height=1080, backend="binned", msaa=2)
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    back = RenderConfig.load(p)
    assert back == cfg
    assert back.projection_matrix().shape == (4, 4)


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, {"tex": np.ones((4, 4, 3)), "step": np.int32(7)},
                    meta={"time": 1.25})
    arrays, meta = load_checkpoint(p)
    np.testing.assert_array_equal(arrays["tex"], np.ones((4, 4, 3)))
    assert int(arrays["step"]) == 7
    assert meta["time"] == 1.25


def test_mesh_merge_and_transform():
    a = sr.shapes.box(1.0)
    b = sr.shapes.uv_sphere(radius=0.3, segments=6)
    m = sr.merge_meshes([a, b])
    assert m.num_vertices == a.num_vertices + b.num_vertices
    assert int(m.indices.max()) < m.num_vertices
    t = sr.transforms.translation_matrix((1.0, 2.0, 3.0))
    moved = sr.transform_mesh(a, t)
    np.testing.assert_allclose(
        np.asarray(moved.positions) - np.asarray(a.positions),
        np.tile([[1, 2, 3]], (a.num_vertices, 1)), atol=1e-6)
    # Pure translation leaves normals unchanged.
    np.testing.assert_allclose(np.asarray(moved.normals),
                               np.asarray(a.normals), atol=1e-6)


def test_scene_builders_construct():
    from software_renderer_tpu.models import scenes
    for fn in [scenes.reference_sphere, scenes.rotating_triangle,
               scenes.intersecting_triangles, scenes.config1_flat_cube]:
        rp = fn(0.1, width=32, height=32)
        assert rp.mesh.positions.shape[-1] == 3


def test_many_objects_scene_budget():
    mesh = sr.shapes.many_objects_scene(target_triangles=3000)
    t = mesh.indices.shape[0] // 3
    assert 2000 <= t <= 3000
    assert mesh.normals is not None and mesh.uvs is not None


def test_resize_bilinear_and_nearest():
    from software_renderer_tpu.ops.resize import (resize_bilinear,
                                                  resize_nearest)
    # Constant image stays constant under any resize (weights sum to 1).
    img = np.full((16, 24, 3), 0.37, np.float32)
    out = np.asarray(resize_bilinear(img, 23, 48))
    np.testing.assert_allclose(out, 0.37, atol=1e-6)
    # A horizontal ramp stays a ramp (bilinear is linear-exact).
    x = np.linspace(0.0, 1.0, 32, dtype=np.float32)
    ramp = np.tile(x[None, :, None], (8, 1, 3))
    up = np.asarray(resize_bilinear(ramp, 8, 64))
    diffs = np.diff(up[4, :, 0])
    assert (diffs[1:-1] >= -1e-6).all()  # monotone interior
    np.testing.assert_allclose(up[:, 0, 0], x[0], atol=1e-6)
    # Nearest 2x upscale replicates pixels exactly (App.swift:31-36).
    img2 = np.arange(12, dtype=np.float32).reshape(3, 4)
    up2 = np.asarray(resize_nearest(img2, 6, 8))
    np.testing.assert_array_equal(up2[::2, ::2], img2)
    np.testing.assert_array_equal(up2[1::2, 1::2], img2)
    # 2D (single-channel) path.
    assert resize_bilinear(img2, 5, 5).shape == (5, 5)


def test_device_info_and_block_on():
    from software_renderer_tpu.utils.device import (DeviceInfo, block_on,
                                                    memory_in_use)
    info = DeviceInfo.query()
    assert info.platform in ("cpu", "tpu")
    assert info.index >= 0
    x = jnp.ones((8, 8)) * 2.0
    assert block_on(x) is x
    mem = memory_in_use()
    assert mem is None or mem >= 0
