"""Binned visibility pass vs the reference backend (exact-coverage golden
cross-check), including the huge-triangle overflow path."""

import numpy as np
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.ops.binning import visibility_binned, build_bins
from software_renderer_tpu.ops.rasterize_pallas import pack_records
from software_renderer_tpu.ops.rasterize_ref import visibility_ref
from software_renderer_tpu.ops.setup import triangle_setup
from software_renderer_tpu.ops.vertex import vertex_stage


def setup_for(positions, tris, width, height, transform=None):
    transform = np.eye(4) if transform is None else transform
    screen, _ = vertex_stage(jnp.asarray(positions, jnp.float32),
                             jnp.asarray(transform, jnp.float32),
                             width, height)
    return triangle_setup(screen, jnp.asarray(tris), width, height)


def compare(positions, tris, width, height, **kw):
    s = setup_for(positions, tris, width, height)
    d_ref, id_ref = visibility_ref(s, width=width, height=height)
    d_bin, id_bin = visibility_binned(s, width=width, height=height, **kw)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_bin))
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_bin))


def test_small_triangles_binned():
    rng = np.random.default_rng(3)
    n = 120
    positions = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    positions[:, 2] = rng.uniform(0.0, 1.0, size=n)
    # Small triangles: cluster vertex triples.
    base = rng.uniform(-0.9, 0.9, size=(40, 1, 3))
    offs = rng.uniform(-0.08, 0.08, size=(40, 3, 3))
    pts = (base + offs).reshape(-1, 3).astype(np.float32)
    pts[:, 2] = rng.uniform(0.1, 0.9, size=len(pts))
    tris = np.arange(120).reshape(40, 3)
    compare(pts, tris, 256, 128)


def test_huge_triangle_overflow():
    # One fullscreen triangle (spans far more than KMAX tiles) behind
    # small ones in front: exercises the overflow merge.
    rng = np.random.default_rng(5)
    pts = [np.array([[-3.0, 3.0, 0.9], [3.0, 3.0, 0.9], [0.0, -3.0, 0.9]],
                    np.float32)]
    tris = [np.array([[0, 1, 2]])]
    base = rng.uniform(-0.8, 0.8, size=(20, 1, 3))
    offs = rng.uniform(-0.1, 0.1, size=(20, 3, 3))
    small = (base + offs).reshape(-1, 3).astype(np.float32)
    small[:, 2] = rng.uniform(0.1, 0.5, size=len(small))
    pts.append(small)
    tris.append(np.arange(60).reshape(20, 3) + 3)
    positions = np.concatenate(pts)
    tri_arr = np.concatenate(tris)
    compare(positions, tri_arr, 256, 192)
    # And with the huge triangle last (checks order-independent ties).
    reorder = np.concatenate([tri_arr[1:], tri_arr[:1]])
    s = setup_for(positions, reorder, 256, 192)
    d_ref, id_ref = visibility_ref(s, width=256, height=192)
    d_bin, id_bin = visibility_binned(s, width=256, height=192)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_bin))


def test_binned_end_to_end_sphere():
    mesh = sr.shapes.uv_sphere(radius=0.2, segments=13, inward_normals=True)
    transform = sr.transforms.reference_demo_transform(2.1)
    rp = sr.RenderPass(mesh=mesh, transform=transform, width=128, height=128)
    fb_ref = sr.render(rp, backend="reference")
    fb_bin = sr.render(rp, backend="binned")
    c_ref = np.asarray(fb_ref.color)
    c_bin = np.asarray(fb_bin.color)
    # Identical coverage and depth; colors agree to plane-evaluation ulps
    # (the Pallas resolve evaluates attribute planes at (x, y) rather than
    # dotting barycentric weights — algebraically equal).
    np.testing.assert_array_equal(c_ref[..., 3], c_bin[..., 3])
    np.testing.assert_array_equal(np.asarray(fb_ref.depth),
                                  np.asarray(fb_bin.depth))
    np.testing.assert_allclose(c_ref, c_bin, atol=1e-4)


def test_binned_gbuffer_shading_matches_reference():
    # Textured + Phong through the Pallas G-buffer resolve vs the XLA
    # gather resolve. Attribute values go through different (algebraically
    # equal) arithmetic, so compare with a tight tolerance.
    from software_renderer_tpu.models import scenes
    for build in (scenes.config2_textured_cube, scenes.config3_phong_mesh):
        rp = build(0.7, width=128, height=96)
        fb_ref = sr.render(rp, backend="reference")
        fb_bin = sr.render(rp, backend="binned")
        c_ref = np.asarray(fb_ref.color)
        c_bin = np.asarray(fb_bin.color)
        np.testing.assert_array_equal(c_ref[..., 3], c_bin[..., 3])
        bad = ~np.isclose(c_ref, c_bin, atol=1e-3)
        assert bad.mean() < 1e-3, f"{build.__name__}: {bad.sum()} bad"


def test_binned_pair_budget_spills_to_overflow():
    # More pairs than the budget: extra triangles must still render
    # (via the overflow path), not vanish.
    from software_renderer_tpu.ops.binning import build_bins
    rng = np.random.default_rng(1)
    n_tri = 80
    base = rng.uniform(-0.9, 0.9, size=(n_tri, 1, 3))
    offs = rng.uniform(-0.5, 0.5, size=(n_tri, 3, 3))  # medium triangles
    pts = (base + offs).reshape(-1, 3).astype(np.float32)
    pts[:, 2] = rng.uniform(0.1, 0.9, size=len(pts))
    tris = np.arange(3 * n_tri).reshape(n_tri, 3)
    s = setup_for(pts, tris, 512, 256)
    info = build_bins(s, width=512, height=256)
    # The premise: this scene must actually exceed the pair budget / kmax
    # so some triangles spill — otherwise the test silently tests nothing.
    assert int(info.n_overflow) > 0, "scene did not spill; test is vacuous"
    d_ref, id_ref = visibility_ref(s, width=512, height=256)
    d_bin, id_bin = visibility_binned(s, width=512, height=256)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_bin))


def test_fused_overflow_seeded_matches_unseeded():
    # The fused kernel's SEEDED path (overflow pre-merged into z/id/
    # G-buffer seeds): forcing kmax=1 makes every multi-tile triangle
    # spill, and the result must equal the spill-free (kmax default) run
    # exactly — nothing dropped, lex ties = first-drawn-wins.
    from functools import partial
    from software_renderer_tpu.models import scenes
    from software_renderer_tpu.ops.binning import build_bins, fused_pipeline
    from software_renderer_tpu.ops.setup import triangle_setup_from_corners
    from software_renderer_tpu.ops.shading import (
        fused_epilogue, fused_output_channels, gather_attribute_values,
        shading_params)
    from software_renderer_tpu.ops.vertex import corner_stage
    w, h = 192, 128  # 64x128 tiles -> 2x2 grid; plenty of 2+-tile spans
    rp = scenes.config2_textured_cube(0.7, width=w, height=h)
    mesh = rp.mesh
    tris = mesh.triangles()
    sc, _ = corner_stage(mesh.positions[tris], rp.transform, w, h)
    s = triangle_setup_from_corners(sc, w, h)
    assert int(build_bins(s, width=w, height=h, kmax=1).n_overflow) > 0
    assert int(build_bins(s, width=w, height=h).n_overflow) == 0
    has_light = rp.light is not None
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
        uvs=mesh.uvs, has_light=has_light)
    out_chans = fused_output_channels(rp.shading, chans, has_light, True)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epi = partial(fused_epilogue, chans=chans, has_light=has_light,
                  has_texture=True)
    run = lambda kmax: fused_pipeline(s, attrs, params, width=w, height=h,
                                      epilogue=epi, n_out=n_out, kmax=kmax)
    d0, i0, o0 = run(12)   # all binned (fast variant)
    d1, i1, o1 = run(1)    # everything spills (seeded variant)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-4)


def test_corner_prune_exact():
    # prune=True (gated; see build_bins docstring) must not change any
    # pixel: thin diagonal slivers spanning many tiles are its target.
    rng = np.random.default_rng(7)
    base = rng.uniform(-0.95, 0.95, size=(40, 1, 2))
    tips = base + rng.uniform(-0.9, 0.9, size=(40, 2, 2)) * [[0.9], [0.02]]
    pts = np.concatenate([base, tips], axis=1).reshape(-1, 2)
    pts = np.concatenate(
        [pts, rng.uniform(0.1, 0.9, size=(len(pts), 1))], -1
    ).astype(np.float32)
    tris = np.arange(120).reshape(40, 3)
    s = setup_for(pts, tris, 512, 256)
    d_ref, id_ref = visibility_ref(s, width=512, height=256)
    d_bin, id_bin = visibility_binned(s, width=512, height=256, prune=True)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_bin))
    # and pruning actually removed pairs on this scene
    from software_renderer_tpu.ops.binning import build_bins
    n_p = int((np.asarray(build_bins(s, width=512, height=256,
                                     prune=True).ids) >= 0).sum())
    n_u = int((np.asarray(build_bins(s, width=512, height=256).ids) >= 0
               ).sum())
    assert n_p < n_u, (n_p, n_u)


def test_overflow_big_wave_multiwave():
    # > chunk (64) spilled triangles: exercises the BIG overflow wave
    # branch (and multi-wave looping when the spill exceeds one wave).
    from software_renderer_tpu.ops.binning import build_bins
    rng = np.random.default_rng(3)
    n_tri = 100
    # Huge triangles spanning most of the frame: every one spans > kmax
    # tiles, so all 100 spill (> one 64-chunk wave).
    a = rng.uniform(-1.0, -0.5, size=(n_tri, 1, 2))
    b = rng.uniform(0.5, 1.0, size=(n_tri, 1, 2))
    c = np.concatenate([rng.uniform(-1, 1, size=(n_tri, 1, 1)),
                        rng.uniform(-1.0, -0.5, size=(n_tri, 1, 1))], -1)
    pts = np.concatenate([a, b, c], axis=1).reshape(-1, 2)
    pts = np.concatenate(
        [pts, rng.uniform(0.1, 0.9, size=(len(pts), 1))], -1
    ).astype(np.float32)
    tris = np.arange(3 * n_tri).reshape(n_tri, 3)
    s = setup_for(pts, tris, 512, 256)
    info = build_bins(s, width=512, height=256)
    assert int(info.n_overflow) > 64, int(info.n_overflow)
    d_ref, id_ref = visibility_ref(s, width=512, height=256)
    d_bin, id_bin = visibility_binned(s, width=512, height=256)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_bin))
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_bin))


def test_fused_sub_chunk_gating_equal():
    # The sub-gated record walk (FUSED_SUB > 1) must be bit-identical to
    # the plain walk — same scene, sub 1 vs 2.
    from functools import partial
    from software_renderer_tpu.models import scenes
    from software_renderer_tpu.ops.binning import fused_pipeline
    from software_renderer_tpu.ops.setup import triangle_setup_from_corners
    from software_renderer_tpu.ops.shading import (
        fused_epilogue, fused_output_channels, gather_attribute_values,
        shading_params)
    from software_renderer_tpu.ops.vertex import corner_stage
    w, h = 192, 128
    rp = scenes.config2_textured_cube(0.4, width=w, height=h)
    mesh = rp.mesh
    tris = mesh.triangles()
    sc, _ = corner_stage(mesh.positions[tris], rp.transform, w, h)
    s = triangle_setup_from_corners(sc, w, h)
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
        uvs=mesh.uvs, has_light=True)
    out_chans = fused_output_channels(rp.shading, chans, True, True)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epi = partial(fused_epilogue, chans=chans, has_light=True,
                  has_texture=True)
    run = lambda sub: fused_pipeline(s, attrs, params, width=w, height=h,
                                     epilogue=epi, n_out=n_out, chunk=64,
                                     sub=sub)
    d1, i1, o1 = run(1)
    d2, i2, o2 = run(2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_bin_stream_invariants():
    rng = np.random.default_rng(9)
    n = 30
    positions = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    positions[:, 2] = 0.5
    tris = rng.integers(0, n, size=(15, 3))
    s = setup_for(positions, tris, 128, 64)
    info = build_bins(s, width=128, height=64)
    ids = np.asarray(info.ids)
    ct = np.asarray(info.chunk_tile)
    ff = np.asarray(info.first_flag)
    # chunk_tile non-decreasing; exactly one first flag per visited tile.
    assert (np.diff(ct) >= 0).all()
    for tile in np.unique(ct):
        flags = ff[ct == tile]
        assert flags[0] == 1 or tile == ct[-1]  # tail chunks share last tile
    # Within a chunk run of one tile, ids ascend (ignoring -1 padding).
    from software_renderer_tpu.ops.rasterize_pallas import CHUNK as chunk
    valid = ids >= 0
    tile_of_entry = np.repeat(ct, chunk)
    for tile in np.unique(tile_of_entry):
        sel = ids[(tile_of_entry == tile) & valid]
        assert (np.diff(sel) > 0).all(), f"tile {tile} ids not ascending"

def test_fused_banded_bit_equal():
    # Band-partitioned layout + slab walk (build_bins(bands>1) +
    # _fused_kernel band_h): bit-identical to the full-tile walk at every
    # band count, including the SEEDED overflow variant (kmax=1 in band
    # units spills every multi-band triangle) and a pair-budget spill.
    # A pixel belongs to exactly one band and its band's list preserves
    # ascending-id order, so the candidate sequence per pixel is
    # unchanged — that is the claim this test pins down.
    from functools import partial
    from software_renderer_tpu.models import scenes
    from software_renderer_tpu.ops.binning import fused_pipeline
    from software_renderer_tpu.ops.setup import triangle_setup_from_corners
    from software_renderer_tpu.ops.shading import (
        fused_epilogue, fused_output_channels, gather_attribute_values,
        shading_params)
    from software_renderer_tpu.ops.vertex import corner_stage
    w, h = 192, 128
    rp = scenes.config2_textured_cube(0.7, width=w, height=h)
    mesh = rp.mesh
    tris = mesh.triangles()
    sc, _ = corner_stage(mesh.positions[tris], rp.transform, w, h)
    s = triangle_setup_from_corners(sc, w, h)
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
        uvs=mesh.uvs, has_light=rp.light is not None)
    out_chans = fused_output_channels(rp.shading, chans,
                                      rp.light is not None, True)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epi = partial(fused_epilogue, chans=chans,
                  has_light=rp.light is not None, has_texture=True)
    run = lambda **kw: fused_pipeline(s, attrs, params, width=w, height=h,
                                      epilogue=epi, n_out=n_out, **kw)
    d0, i0, o0 = run(bands=1)
    for kw in (dict(bands=2), dict(bands=8, glen=8),
               dict(bands=2, kmax=1),              # seeded overflow
               dict(bands=2, pair_budget_factor=0.05)):  # budget spill
        d, i, o = run(**kw)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i),
                                      err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d),
                                      err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o),
                                   atol=1e-4, err_msg=str(kw))


def test_banded_unaligned_cap_bit_equal():
    # Layout capacity NOT a chunk multiple: ntiles=3, bands=2 gives
    # n_fill1 = 6 bins x glen 16 = 96, which is not a multiple of the
    # interpret-mode chunk (64) — before the cap was chunk-aligned, the
    # floor(cap/chunk) grid silently truncated the last partial chunk
    # (at 1080p production sizes: 64 slots that can hold real records
    # in a fully-packed layout). Banded must stay bit-equal to full-tile.
    from functools import partial
    from software_renderer_tpu.models import scenes
    from software_renderer_tpu.ops.binning import fused_pipeline
    from software_renderer_tpu.ops.setup import triangle_setup_from_corners
    from software_renderer_tpu.ops.shading import (
        fused_epilogue, fused_output_channels, gather_attribute_values,
        shading_params)
    from software_renderer_tpu.ops.vertex import corner_stage
    w, h = 384, 128
    rp = scenes.config2_textured_cube(0.9, width=w, height=h)
    mesh = rp.mesh
    tris = mesh.triangles()
    sc, _ = corner_stage(mesh.positions[tris], rp.transform, w, h)
    s = triangle_setup_from_corners(sc, w, h)
    attrs, chans = gather_attribute_values(
        rp.shading, tris, colors=mesh.colors, normals=mesh.normals,
        uvs=mesh.uvs, has_light=rp.light is not None)
    out_chans = fused_output_channels(rp.shading, chans,
                                      rp.light is not None, True)
    n_out = sum(sz for _, sz in out_chans)
    params = shading_params(rp.light, flat_color=rp.flat_color)
    epi = partial(fused_epilogue, chans=chans,
                  has_light=rp.light is not None, has_texture=True)
    run = lambda **kw: fused_pipeline(s, attrs, params, width=w, height=h,
                                      epilogue=epi, n_out=n_out, **kw)
    d0, i0, o0 = run(bands=1)
    d, i, o = run(bands=2)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d))
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o), atol=1e-4)
