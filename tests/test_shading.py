"""Shading modes: flat, phong, textured; texture sampling; MSAA."""

import numpy as np
import jax
import jax.numpy as jnp

import software_renderer_tpu as sr
from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops.msaa import render_msaa, downsample_box
from software_renderer_tpu.ops.texture import (Texture, checkerboard,
                                               sample_texture)


def fullscreen_quad_rp(width=64, height=64, **kw):
    # Two triangles covering the viewport (z = 0.5), uv = [0,1]^2.
    positions = np.array([
        [-1, 1, 0.5], [1, 1, 0.5], [1, -1, 0.5], [-1, -1, 0.5]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    normals = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (4, 1))
    colors = np.ones((4, 3), np.float32)
    mesh = sr.mesh_from_numpy(positions, np.array([0, 1, 2, 0, 2, 3]),
                              colors=colors, normals=normals, uvs=uvs)
    return sr.RenderPass(mesh=mesh, transform=jnp.eye(4), width=width,
                         height=height, **kw)


def test_flat_shading():
    rp = fullscreen_quad_rp(shading="flat",
                            flat_color=jnp.array([0.2, 0.4, 0.6]))
    fb = sr.render(rp, backend="reference")
    c = np.asarray(fb.color)
    covered = c[..., 3] > 0
    assert covered.mean() > 0.98
    assert np.abs(c[covered][:, :3] - np.array([0.2, 0.4, 0.6])).max() < 1e-6


def test_textured_quad_matches_texture():
    tex = checkerboard(64, 8)
    rp = fullscreen_quad_rp(shading="textured", texture=tex)
    fb = sr.render(rp, backend="reference")
    c = np.asarray(fb.color)
    # Away from checker edges, the rendered color equals the texel color.
    # Sample interior points of several tiles.
    h = w = 64
    for py, px in [(4, 4), (4, 12), (20, 28), (60, 60)]:
        uv = ((px + 0.5) / w, (py + 0.5) / h)
        texel = np.asarray(sample_texture(tex, jnp.array(uv)))
        np.testing.assert_allclose(c[py, px, :3], texel, atol=0.02)


def test_phong_lit_quad():
    light = sr.Light(
        direction=jnp.array([0.0, 0.0, 1.0]),   # straight at the quad
        color=jnp.array([1.0, 1.0, 1.0]),
        ambient=jnp.array([0.1, 0.1, 0.1]),
        specular=jnp.array([0.0, 0.0, 0.0]),    # isolate diffuse
        shininess=jnp.float32(16.0),
    )
    rp = fullscreen_quad_rp(shading="phong", light=light)
    fb = sr.render(rp, backend="reference")
    c = np.asarray(fb.color)
    covered = c[..., 3] > 0
    # normal (0,0,-1), l = -dir = (0,0,-1): n.l = 1 -> ambient + diffuse.
    assert np.abs(c[covered][:, :3] - 1.1).max() < 1e-5


def test_phong_normal_falloff():
    # Sphere under a directional light: the lit hemisphere must be brighter
    # than the rim.
    rp = scenes.config3_phong_mesh(0.3, width=96, height=96)
    fb = sr.render(rp, backend="reference")
    c = np.asarray(fb.color)
    covered = c[..., 3] > 0
    assert covered.any()
    vals = c[covered][:, :3].mean(axis=-1)
    assert vals.max() > vals.min() + 0.1  # real shading variation


def test_texture_wrap_modes():
    data = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1) / 15.0
    uv = jnp.array([[1.25, 0.125], [-0.75, 0.125]])  # both wrap to u=0.25
    rep = sample_texture(Texture(data=data, filter="nearest", wrap="repeat"),
                         uv)
    cl = sample_texture(Texture(data=data, filter="nearest", wrap="clamp"),
                        uv)
    assert np.allclose(np.asarray(rep[0]), np.asarray(rep[1]))
    assert float(cl[0, 0]) == float(data[0, 3, 0])   # clamped right edge
    assert float(cl[1, 0]) == float(data[0, 0, 0])   # clamped left edge


def test_bilinear_interpolates_midpoint():
    data = jnp.zeros((2, 2, 1), jnp.float32).at[0, 1, 0].set(1.0)
    tex = Texture(data=data, filter="bilinear", wrap="clamp")
    mid = sample_texture(tex, jnp.array([0.5, 0.25]))
    assert 0.2 < float(mid[0]) < 0.8


def test_msaa_smooths_edges():
    rp = scenes.intersecting_triangles(0.2, width=64, height=64)
    fb1 = sr.render(rp, backend="reference")
    fb4 = render_msaa(rp, samples=2, backend="reference")
    c1 = np.asarray(fb1.color)
    c4 = np.asarray(fb4.color)
    assert c1.shape == c4.shape
    # Supersampled image has intermediate alpha values along edges.
    a4 = c4[..., 3]
    assert ((a4 > 0.1) & (a4 < 0.9)).sum() > 10
    # Interiors agree.
    interior = (c1[..., 3] == 1.0) & (a4 == 1.0)
    assert np.abs(c1[interior] - c4[interior]).mean() < 0.2


def test_downsample_box():
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    out = np.asarray(downsample_box(img, 2))
    np.testing.assert_allclose(out[0, 0, 0], (0 + 1 + 4 + 5) / 4)


# ---- segment-compacted bilinear sampler --------------------------------


def _compacted_case(rng, h, w, wrap, c=3, th=32, tw=32, cover_p=0.2,
                    cap_fracs=(0.35, 0.75)):
    from software_renderer_tpu.ops.texture import (
        sample_texture_planes, sample_texture_planes_compacted)
    data = jnp.asarray(rng.random((th, tw, c), np.float32))
    tex = Texture(data=data, wrap=wrap)
    u = jnp.asarray(rng.random((h, w), np.float32) * 3.0 - 1.0)
    v = jnp.asarray(rng.random((h, w), np.float32) * 3.0 - 1.0)
    # Clustered coverage: a band of rows, so some segments are empty.
    covered = jnp.asarray(
        (rng.random((h, w)) < cover_p)
        & (np.arange(h)[:, None] < h // 2))
    got = sample_texture_planes_compacted(tex, u, v, covered,
                                          cap_fracs=cap_fracs)
    want = sample_texture_planes(tex, u, v)
    return got, want, covered


def test_compacted_sampler_bit_equal_covered():
    """Covered pixels must equal the per-pixel quad path to one ulp (same
    table rows, same lerp expression; XLA's per-fusion FMA contraction
    differs between the [cap, K] and [H, W] shapes)."""
    rng = np.random.default_rng(7)
    for wrap in ("repeat", "clamp"):
        got, want, covered = _compacted_case(rng, 16, 256, wrap=wrap)
        cov = np.asarray(covered)
        assert cov.any()
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g)[cov],
                                       np.asarray(w_)[cov], atol=1e-6)


def test_compacted_sampler_fallback_over_cap():
    """Covered-segment count above cap -> whole-frame fallback, exact
    everywhere (not just covered pixels) up to cond-fusion ulps."""
    rng = np.random.default_rng(8)
    got, want, _ = _compacted_case(rng, 16, 256, wrap="repeat",
                                   cover_p=1.0, cap_fracs=(0.1, 0.25))
    for g, w_ in zip(got, want):
        # same code path, but cond-branch fusion can contract FMAs
        # differently than the standalone call -> one-ulp class again
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   atol=1e-6)


def test_compacted_sampler_engages():
    """The sparse case must actually take the compacted branch (no silent
    always-fallback): count the branch bodies under disable_jit, where
    lax.cond runs only the selected branch. Runs both routes by forcing
    TEX_WINDOWED: the XLA quad tier (production default) and the opt-in
    windowed Mosaic kernel (ops/texture_kernel.py)."""
    from software_renderer_tpu.ops import texture as tex_mod
    from software_renderer_tpu.ops import texture_kernel as tk_mod
    rng = np.random.default_rng(9)
    quad_calls = []
    win_calls = []
    orig_quad = tex_mod._quad_table
    orig_packed = tex_mod._packed_quad_table
    orig_sample = tk_mod.sample_segments_windowed
    orig_win = tex_mod.TEX_WINDOWED
    orig_pack = tex_mod.TEX_TABLE_PACK

    def spy_quad(tex):
        quad_calls.append(1)
        return orig_quad(tex)

    def spy_packed(tex, pack):
        quad_calls.append(1)      # any table build counts as one gather
        return orig_packed(tex, pack)

    def spy_win(*a, **kw):
        win_calls.append(1)
        return orig_sample(*a, **kw)

    def run(windowed):
        # tw=128 so windowed_supported admits the texture (tw must split
        # into whole 128-lane tiles; 32x32 correctly declines the kernel).
        # The windowed route requires pack 1 (it replaces the table).
        tex_mod.TEX_WINDOWED = windowed
        tex_mod.TEX_TABLE_PACK = 1 if windowed else orig_pack
        win_calls.clear()
        quad_calls.clear()
        with jax.disable_jit():
            _compacted_case(rng, 16, 256, wrap="repeat", cover_p=0.1,
                            th=32, tw=128)
        sparse = (len(win_calls), len(quad_calls))
        win_calls.clear()
        quad_calls.clear()
        # 32x512 -> 128 segments: the windowed path rounds caps up to
        # SEG_PER_STEP (32), so the frame must hold more covered
        # segments (64) than the rounded cap for fallback to engage.
        with jax.disable_jit():
            _compacted_case(rng, 32, 512, wrap="repeat", cover_p=1.0,
                            cap_fracs=(0.1, 0.25), th=32, tw=128)
        return sparse, (len(win_calls), len(quad_calls))

    tex_mod._quad_table = spy_quad
    tex_mod._packed_quad_table = spy_packed
    tk_mod.sample_segments_windowed = spy_win
    try:
        sparse_q, dense_q = run(False)
        sparse_w, dense_w = run(True)
    finally:
        tex_mod._quad_table = orig_quad
        tex_mod._packed_quad_table = orig_packed
        tk_mod.sample_segments_windowed = orig_sample
        tex_mod.TEX_WINDOWED = orig_win
        tex_mod.TEX_TABLE_PACK = orig_pack
    # quad route: compacted tier gathers once + the 'want' recompute;
    # dense fallback also gathers once (+ the 'want').
    assert sparse_q == (0, 2) and dense_q == (0, 2)
    # windowed route (forced, mode "1"): sparse takes the kernel at the
    # engaged tier; dense exceeds every rounded cap and takes the
    # FULL-COVERAGE windowed fallback (round 5: forcing the kernel means
    # over-cap frames walk all segments directly — the XLA row gather is
    # skipped entirely; ops/texture.py win_full). The quad table is
    # built only for the test's 'want' recompute in both cases.
    assert sparse_w == (1, 1) and dense_w == (1, 1)


def test_pack_variants_bit_equal():
    """Every quad-table packing (2/4 pair-packs, 16 = 4x4 supertile) is a
    pure relayout + exact-f32 select tree: both the compacted tier and
    the full-frame path must be BIT-equal to the pack-1 classic layout,
    everywhere (uncovered lanes included — they sample the same clamped
    slots whatever the table geometry)."""
    from software_renderer_tpu.ops import texture as tex_mod
    orig = tex_mod.TEX_TABLE_PACK
    outs = {}
    try:
        for pack in (1, 2, 4, 16):
            tex_mod.TEX_TABLE_PACK = pack
            rng = np.random.default_rng(11)
            got, want, covered = _compacted_case(rng, 16, 256,
                                                 wrap="repeat",
                                                 th=32, tw=128)
            outs[pack] = (got, want)
    finally:
        tex_mod.TEX_TABLE_PACK = orig
    ref_got, ref_want = outs[1]
    for pack in (2, 4, 16):
        got, want = outs[pack]
        for g, rg in zip(got, ref_got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(rg),
                                          err_msg=f"compacted pack {pack}")
        for w_, rw in zip(want, ref_want):
            np.testing.assert_array_equal(np.asarray(w_), np.asarray(rw),
                                          err_msg=f"full-frame pack {pack}")


def test_compacted_sampler_single_channel_finite():
    rng = np.random.default_rng(10)
    got, want, covered = _compacted_case(rng, 8, 128, wrap="clamp", c=1,
                                         cover_p=0.3)
    cov = np.asarray(covered)
    assert len(got) == 1
    np.testing.assert_allclose(np.asarray(got[0])[cov],
                               np.asarray(want[0])[cov], atol=1e-6)
    # Uncovered outputs are garbage but must not be +-inf (callers
    # multiply by 0; inf*0 = NaN leaks through sums).
    assert not np.isinf(np.asarray(got[0])[~cov]).any()


def test_compaction_maps_roundtrip():
    """slot/comp_seg are mutually inverse on covered segments and n_cov
    counts them, for random and edge-case (none/all covered) masks."""
    from software_renderer_tpu.ops.texture import _segment_compaction_maps
    rng = np.random.default_rng(11)
    for ns, p in ((7, 0.4), (128, 0.0), (128, 1.0), (300, 0.3),
                  (1000, 0.9)):
        scov = jnp.asarray(rng.random(ns) < p)
        cap = ns + 8 - ns % 8
        comp_seg, slot, n_cov = _segment_compaction_maps(scov, cap)
        scov_np = np.asarray(scov)
        ids = np.nonzero(scov_np)[0]
        assert int(n_cov) == len(ids)
        np.testing.assert_array_equal(np.asarray(comp_seg)[:len(ids)], ids)
        np.testing.assert_array_equal(np.asarray(slot)[ids],
                                      np.arange(len(ids)))
