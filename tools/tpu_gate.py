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


def check(name, rp, backends=("binned", "pallas"), atol=1e-3,
          golden_backend="reference"):
    """atol: color ulp class. Lit (Phong/specular) scenes pass a wider
    bound: normalization is bit-equal across compilers (1/sqrt, see
    ops/shading.py), but `pow(ndoth, shininess)` lowers to different
    exp/log approximations under Mosaic vs XLA and the specular exponent
    amplifies those ulps ~shininess-fold (same tolerance class as the
    reference's fast-math GPU vs Swift CPU pair).

    golden_backend: the cross-check source. 'reference' (pure XLA) for
    scenes it can afford; the 1080p/100k north-star uses the unbinned
    'pallas' kernel + XLA gather resolve as golden instead (independent
    binning/stream/fused-epilogue code paths; visibility math shared —
    which is exactly what the coverage/depth bit-equality certifies)."""
    fb_ref = jax.block_until_ready(sr.render(rp, backend=golden_backend))
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


def check_fe_kernel():
    """The Pallas FE kernel vs the XLA planar front-end, FULL bit-equality
    on hardware (Mosaic and XLA:TPU agree on FMA contraction; XLA:CPU
    hosts only get the contraction class — testing/compare.py). Guards
    the default auto-route planar_front takes at T >= PALLAS_FE_MIN_T."""
    import dataclasses as dc

    from software_renderer_tpu.testing.fixtures import fe_gate_scene

    ps_x, ps_p, _, _ = fe_gate_scene()
    for f in [x.name for x in dc.fields(ps_x)]:
        a, b = np.asarray(getattr(ps_x, f)), np.asarray(getattr(ps_p, f))
        assert a.dtype == b.dtype and a.shape == b.shape, f
        np.testing.assert_array_equal(
            a, b, err_msg=f"FE kernel vs XLA planar front: field {f}")
    print("  FE kernel vs XLA planar front: all 23 fields bit-equal",
          flush=True)


def check_texture_knobs():
    """Texture-route variants on the REAL chip: the pack-16 select tree,
    the forced Mosaic windowed sampler, and the adaptive lax.cond route
    each lower differently (interpret-mode bit-equality says nothing
    about Mosaic/XLA:TPU lowering — the gate's whole point; these three
    had never run on hardware before round 5). The Texture is built at
    default pack, so the pack-16 leg also exercises the in-graph
    packed-table build."""
    from software_renderer_tpu.ops import texture as tex_mod
    rp = scenes.config2_textured_cube(0.7)
    fb_ref = jax.block_until_ready(sr.render(rp, backend="reference"))
    c_ref = np.asarray(fb_ref.color)
    d_ref = np.asarray(fb_ref.depth)
    old_pack, old_win = tex_mod.TEX_TABLE_PACK, tex_mod.TEX_WINDOWED
    try:
        for label, pack, win in (("pack16", 16, "0"),
                                 ("windowed", 1, "1"),
                                 ("adaptive", 1, "adaptive")):
            tex_mod.TEX_TABLE_PACK, tex_mod.TEX_WINDOWED = pack, win
            fb = jax.block_until_ready(sr.render(rp, backend="binned"))
            c, d = np.asarray(fb.color), np.asarray(fb.depth)
            np.testing.assert_array_equal(
                c[..., 3], c_ref[..., 3],
                err_msg=f"tex-{label}: coverage mismatch")
            np.testing.assert_array_equal(
                d, d_ref, err_msg=f"tex-{label}: depth mismatch")
            bad = ~np.isclose(c, c_ref, atol=1e-3)
            assert bad.mean() < 1e-3, (
                f"tex-{label}: {bad.sum()} color values off "
                f"(max d={np.abs(c - c_ref).max():.2e})")
            print(f"  texture knob {label:>8}: coverage+depth exact, "
                  f"color max d {np.abs(c - c_ref).max():.2e}", flush=True)
    finally:
        tex_mod.TEX_TABLE_PACK, tex_mod.TEX_WINDOWED = old_pack, old_win

    # Mipmapped trilinear (round 5, opt-in): binned-vs-reference with the
    # SAME trilinear texture — covers the packed-pyramid double gather +
    # per-pixel level indexing on real XLA:TPU lowering.
    import dataclasses as _dc
    tri = tex_mod.Texture(data=rp.texture.data, filter="trilinear",
                          wrap=rp.texture.wrap)
    rp_tri = _dc.replace(rp, texture=tri)
    fb_r = jax.block_until_ready(sr.render(rp_tri, backend="reference"))
    fb_b = jax.block_until_ready(sr.render(rp_tri, backend="binned"))
    cr, cb = np.asarray(fb_r.color), np.asarray(fb_b.color)
    np.testing.assert_array_equal(cb[..., 3], cr[..., 3],
                                  err_msg="tex-trilinear: coverage mismatch")
    np.testing.assert_array_equal(np.asarray(fb_b.depth),
                                  np.asarray(fb_r.depth),
                                  err_msg="tex-trilinear: depth mismatch")
    bad = ~np.isclose(cb, cr, atol=2e-3)
    assert bad.mean() < 1e-3, (
        f"tex-trilinear: {bad.sum()} color values off "
        f"(max d={np.abs(cb - cr).max():.2e})")
    print(f"  texture knob trilinear: coverage+depth exact, "
          f"color max d {np.abs(cb - cr).max():.2e}", flush=True)


def main():
    write_golden = "--write-golden" in sys.argv
    dev = jax.devices()[0]
    print(f"gate device: {dev.platform} {dev.device_kind}", flush=True)
    assert dev.platform == "tpu", (
        "the hardware gate must run on a real TPU (got "
        f"{dev.platform}; unset JAX_PLATFORMS overrides)")
    import subprocess
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__)))).stdout.strip()
    print(f"gate git sha: {sha}", flush=True)

    check_fe_kernel()
    check("config1 cube", scenes.config1_flat_cube(0.5))
    check("config2 textured", scenes.config2_textured_cube(0.7))
    check_texture_knobs()
    check("config3 teapot", scenes.config3_phong_mesh(0.3), atol=4e-3)
    check("overflow seeded", overflow_scene())
    check("clip straddling", _clip_scene(), backends=("binned",))
    check("perspective quad", _perspective_scene(), backends=("binned",))

    # The north-star scene itself (config 4: 1920x1080, 100k triangles,
    # culling on -> pair budget 0.75, production tile/chunk constants) —
    # the configuration whose binned machinery is most stressed, validated
    # by backend parity on hardware rather than only a bench checksum.
    # Golden = the unbinned pallas kernel (a 'reference' render at this
    # size would be O(T x pixels) ~ 2e11 edge tests). Plus forced-spill
    # variants at the same constants: 2 huge triangles take the one-chunk
    # small-wave overflow branch, 200 take the full-capacity waves.
    if os.environ.get("GATE_SKIP_CONFIG4", "0") != "1":
        check("config4 northstar", scenes.config4_many_objects(0.3),
              backends=("binned",), golden_backend="pallas", atol=4e-3)
        check("config4 small spill", _config4_spill(2),
              backends=("binned",), golden_backend="pallas", atol=4e-3)
        check("config4 mass spill", _config4_spill(200),
              backends=("binned",), golden_backend="pallas", atol=4e-3)

    # Row-sliced binned render on real Mosaic (the render_sharded per-
    # shard configuration: production backend, y_start != 0): the row
    # slices must reassemble to the full frame up to depth-tie ulps with
    # EXACT coverage (the round-4 verdict's sharded-configuration gate).
    from software_renderer_tpu.render import render_rows
    from software_renderer_tpu.testing.compare import assert_tie_class_equal
    rp_rows = scenes.config3_phong_mesh(0.3)
    full = jax.block_until_ready(sr.render(rp_rows, backend="binned"))
    h2 = rp_rows.height // 2
    top = render_rows(rp_rows, y_start=0, rows=h2, backend="binned")
    bot = render_rows(rp_rows, y_start=h2, rows=h2, backend="binned")
    color = np.concatenate([np.asarray(top.color), np.asarray(bot.color)])
    depth = np.concatenate([np.asarray(top.depth), np.asarray(bot.depth)])
    np.testing.assert_array_equal(color[..., 3],
                                  np.asarray(full.color[..., 3]),
                                  err_msg="row-sliced binned: coverage")
    assert_tie_class_equal(full.color, color, full.depth, depth, atol=4e-3,
                           context="row-sliced binned render (y_start!=0)")
    print("  row-sliced binned render: coverage exact, tie-class equal",
          flush=True)

    # SSAA x2 on hardware at scale (ops/msaa.py renders the whole frame
    # at 2x resolution through the production path — never before run on
    # real Mosaic; exercises the 2x-size tile grid + downsample).
    from software_renderer_tpu.ops.msaa import render_msaa
    rp_aa = scenes.config2_textured_cube(0.7)
    fb_aa = jax.block_until_ready(render_msaa(rp_aa, samples=2))
    c_aa = np.asarray(fb_aa.color)
    assert c_aa.shape == (rp_aa.height, rp_aa.width, 4)
    assert np.isfinite(c_aa).all()
    # The box filter of the 2x frame must average the 2x backend pair
    # bit-for-bit: compare against the reference backend's 2x render
    # downsampled the same way (coverage-weighted alpha equal).
    import dataclasses as _dc
    from software_renderer_tpu.ops.msaa import downsample_box
    hi = _dc.replace(rp_aa, width=rp_aa.width * 2, height=rp_aa.height * 2)
    fb_hi_ref = sr.render(hi, backend="reference")
    c_ref = np.asarray(downsample_box(fb_hi_ref.color, 2))
    np.testing.assert_array_equal(c_aa[..., 3], c_ref[..., 3],
                                  err_msg="ssaa2: coverage-weighted alpha")
    bad = ~np.isclose(c_aa, c_ref, atol=1e-3)
    assert bad.mean() < 1e-3, f"ssaa2: {bad.sum()} values off"
    print("  SSAA x2: alpha exact vs reference-downsample, color in class",
          flush=True)

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


def _config4_spill(n_huge: int, time: float = 0.3):
    """Config 4 plus ``n_huge`` screen-spanning triangles: their bbox tile
    span exceeds KMAX, so they spill to the overflow waves at production
    constants (chunk 128: n_huge <= 128 exercises the small one-chunk
    wave, larger counts the full-capacity waves)."""
    import dataclasses
    rp = scenes.config4_many_objects(time)
    mesh = rp.mesh
    rng = np.random.default_rng(5)
    nv = mesh.num_vertices
    pos, col, nrm, uv, idx = [], [], [], [], []
    for i in range(n_huge):
        z = 0.2 + 0.6 * rng.random()
        ang = rng.random() * 2 * np.pi
        c, s = np.cos(ang), np.sin(ang)
        base = np.array([[-4.0, 4.0, z], [4.0, 4.0, z], [0.0, -5.0, z]],
                        np.float32)
        base[:, :2] = base[:, :2] @ np.array([[c, -s], [s, c]], np.float32)
        pos.append(base)
        col.append(rng.uniform(0.3, 1.0, (3, 3)).astype(np.float32))
        nrm.append(np.tile(np.array([[0.0, 0.0, -1.0]], np.float32),
                           (3, 1)))
        uv.append(np.array([[0, 0], [1, 0], [0.5, 1]], np.float32))
        # Both windings, so exactly one of each pair survives backface
        # culling under the scene's production cull_backfaces=True.
        idx.append(nv + 3 * i + np.array([0, 1, 2, 0, 2, 1]))
    mesh2 = sr.mesh_from_numpy(
        np.concatenate([np.asarray(mesh.positions)] + pos),
        np.concatenate([np.asarray(mesh.indices)] + idx),
        colors=np.concatenate([np.asarray(mesh.colors)] + col),
        normals=np.concatenate([np.asarray(mesh.normals)] + nrm),
        uvs=np.concatenate([np.asarray(mesh.uvs)] + uv))
    return dataclasses.replace(rp, mesh=mesh2)


def _perspective_scene():
    """Slanted textured quad with perspective_correct=True: exercises the
    fused kernel's attr/w + 1/w epilogue divide on real Mosaic."""
    from software_renderer_tpu.ops import transforms as tf
    positions = np.array([
        [-0.5, -0.2, -0.5], [0.5, -0.2, -0.5],
        [0.5, -0.2, -3.0], [-0.5, -0.2, -3.0]], np.float32)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    mesh = sr.mesh_from_numpy(positions, np.array([0, 1, 2, 0, 2, 3]),
                              colors=np.ones((4, 3), np.float32), uvs=uvs)
    proj = tf.perspective(np.pi / 3, 1.0, 0.1, 10.0)
    view = tf.look_at(eye=(0.0, 0.3, 0.5), target=(0.0, -0.2, -2.0))
    return sr.RenderPass(mesh=mesh, transform=proj @ view, width=256,
                         height=256, shading="textured",
                         texture=sr.checkerboard(64, 8),
                         perspective_correct=True)


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
