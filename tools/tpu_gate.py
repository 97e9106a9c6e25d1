#!/usr/bin/env python
"""On-hardware correctness gate: backend cross-checks on the REAL TPU.

Interpret-mode CPU tests cannot catch a Mosaic miscompile or tiling edge
case; this gate runs the production kernels on the actual chip and
asserts, for several scenes:

* depth + tri_id (via alpha/coverage) bit-equal between the `binned`
  (fused Pallas), `pallas` (unbinned Pallas), and `reference` (pure XLA)
  backends;
* color equal to the reference backend within the documented ulp class
  (atol 1e-3, plane-evaluation vs barycentric-dot arithmetic);
* the rendered reference-sphere frame matches the checked-in golden PNG
  byte-for-byte after quantization (tests/golden/sphere_tpu.png —
  regenerate with --write-golden when semantics change intentionally).

This is the reference's dual-implementation cross-check (App.swift:154)
promoted to an automated hardware gate.

Usage: nohup python tools/tpu_gate.py > /tmp/tpu_gate.log 2>&1 &
       python tools/tpu_gate.py --write-golden   # refresh the artifact
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu import runtime  # noqa: E402
from software_renderer_tpu.framebuffer import to_rgba8  # noqa: E402
from software_renderer_tpu.models import scenes  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "tests", "golden", "sphere_tpu.png")


def overflow_scene():
    """Textured cube + two huge background triangles: forces the seeded
    fused path (overflow waves) on hardware."""
    import dataclasses
    rp = scenes.config2_textured_cube(0.7, width=512, height=448)
    mesh = rp.mesh
    pos = np.concatenate([
        np.asarray(mesh.positions),
        np.array([[-4, 4, 0.95], [4, 4, 0.95], [0, -5, 0.95],
                  [-4, -4, 0.4], [4, -4, 0.4], [0, 5, 0.62]], np.float32)])
    nv = mesh.num_vertices
    idx = np.concatenate([np.asarray(mesh.indices), nv + np.arange(6)])
    mesh2 = sr.mesh_from_numpy(
        pos, idx,
        colors=np.concatenate([np.asarray(mesh.colors),
                               np.ones((6, 3), np.float32)]),
        normals=np.concatenate([
            np.asarray(mesh.normals),
            np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (6, 1))]),
        uvs=np.concatenate([
            np.asarray(mesh.uvs),
            np.array([[0, 0], [1, 0], [.5, 1], [0, 1], [1, 1], [.5, 0]],
                     np.float32)]))
    return dataclasses.replace(rp, mesh=mesh2)


def sphere_scene():
    mesh = sr.shapes.uv_sphere(radius=0.2, segments=13, inward_normals=True)
    transform = sr.transforms.reference_demo_transform(0.7)
    return sr.RenderPass(mesh=mesh, transform=transform, width=256,
                         height=256, shading="vertex")


def check(name, rp, backends=("binned", "pallas"), atol=1e-3):
    """atol: color ulp class. Lit (Phong/specular) scenes pass a wider
    bound: normalization is bit-equal across compilers (1/sqrt, see
    ops/shading.py), but `pow(ndoth, shininess)` lowers to different
    exp/log approximations under Mosaic vs XLA and the specular exponent
    amplifies those ulps ~shininess-fold (same tolerance class as the
    reference's fast-math GPU vs Swift CPU pair)."""
    fb_ref = jax.block_until_ready(sr.render(rp, backend="reference"))
    c_ref = np.asarray(fb_ref.color)
    d_ref = np.asarray(fb_ref.depth)
    for backend in backends:
        fb = jax.block_until_ready(sr.render(rp, backend=backend))
        c, d = np.asarray(fb.color), np.asarray(fb.depth)
        np.testing.assert_array_equal(
            c[..., 3], c_ref[..., 3],
            err_msg=f"{name}/{backend}: coverage mismatch")
        np.testing.assert_array_equal(
            d, d_ref, err_msg=f"{name}/{backend}: depth mismatch")
        bad = ~np.isclose(c, c_ref, atol=atol)
        assert bad.mean() < 1e-3, (
            f"{name}/{backend}: {bad.sum()} color values off "
            f"(max d={np.abs(c - c_ref).max():.2e})")
        print(f"  {name:>18} vs {backend:>7}: coverage+depth exact, "
              f"color max d {np.abs(c - c_ref).max():.2e}", flush=True)


def main():
    write_golden = "--write-golden" in sys.argv
    dev = jax.devices()[0]
    print(f"gate device: {dev.platform} {dev.device_kind}", flush=True)
    assert dev.platform == "tpu", (
        "the hardware gate must run on a real TPU (got "
        f"{dev.platform}; unset JAX_PLATFORMS overrides)")

    check("config1 cube", scenes.config1_flat_cube(0.5))
    check("config2 textured", scenes.config2_textured_cube(0.7))
    check("config3 teapot", scenes.config3_phong_mesh(0.3), atol=4e-3)
    check("overflow seeded", overflow_scene())
    check("clip straddling", _clip_scene(), backends=("binned",))

    # Golden image artifact: the reference demo sphere, quantized.
    fb = jax.block_until_ready(sr.render(sphere_scene(), backend="binned"))
    img = np.asarray(to_rgba8(fb.color))
    if write_golden or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        runtime.write_png(GOLDEN, img)
        print(f"  wrote golden {GOLDEN}", flush=True)
    else:
        golden = runtime.read_png(GOLDEN)
        np.testing.assert_array_equal(img, golden,
                                      err_msg="sphere golden PNG mismatch")
        print("  sphere matches golden PNG byte-for-byte", flush=True)
    print("TPU GATE PASSED", flush=True)


def _clip_scene():
    """Quad straddling the eye plane under perspective + clip_near."""
    from software_renderer_tpu.ops import transforms as tf
    positions = np.array([
        [-1.0, -0.3, 1.0], [1.0, -0.3, 1.0],
        [1.0, -0.3, -4.0], [-1.0, -0.3, -4.0]], np.float32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]],
                      np.float32)
    mesh = sr.mesh_from_numpy(positions, np.array([0, 1, 2, 0, 2, 3]),
                              colors=colors)
    proj = tf.perspective(np.pi / 3, 1.0, 0.1, 10.0)
    view = tf.look_at(eye=(0.0, 0.4, 0.0), target=(0.0, -0.3, -2.0))
    return sr.RenderPass(mesh=mesh, transform=proj @ view, width=256,
                         height=256, shading="vertex", clip_near=True)


if __name__ == "__main__":
    main()
