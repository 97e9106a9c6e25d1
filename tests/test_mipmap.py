"""Mipmapped trilinear filtering (``Texture(filter="trilinear")``).

An opt-in extension PAST the reference's feature set (the reference has
no texturing at all — UVs are loaded then dropped,
renderer/App.swift:129-133) and past the north star's bilinear, built
the same TPU-shaped way: the whole pyramid is one packed pack-1 quad
table and a sample is two row gathers with the per-pixel level folded
into the row index (ops/texture.py mipmap section).

Semantics contract asserted here:
* the mip chain is exact 2x2 box averaging;
* at an exactly-integer lod k, trilinear == bilinear sampling of mip
  level k directly (bit-equal — the level lerp is ``a + (b-a)*0``);
* default LOD is the GPU quad-derivative rule on the [H, W] uv planes
  (forward differences, max of the x/y texel-space footprints);
* gradients flow to BASE texels through the pyramid (training a
  texture through a trilinear sampler).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from software_renderer_tpu.ops.texture import (
    Texture, _lod_rho2, _mip_chain, _num_mip_levels, sample_texture_planes,
    sample_texture_planes_trilinear, sample_texture_planes_trilinear_compacted,
    screen_lod)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _uv_grid(h, w, u_span=1.0, v_span=1.0, u0=0.0, v0=0.0):
    u = u0 + (np.arange(w, dtype=np.float32) + 0.5) * (u_span / w)
    v = v0 + (np.arange(h, dtype=np.float32) + 0.5) * (v_span / h)
    return (jnp.asarray(np.broadcast_to(u, (h, w))),
            jnp.asarray(np.broadcast_to(v[:, None], (h, w))))


def test_mip_chain_is_exact_box_average():
    d = _rng(1).random((16, 8, 3), dtype=np.float32)
    chain = _mip_chain(jnp.asarray(d))
    assert len(chain) == _num_mip_levels(16, 8) == 4
    lvl = d
    for got in chain[1:]:
        lvl = np.float32(0.25) * (lvl[0::2, 0::2] + lvl[1::2, 0::2]
                                  + lvl[0::2, 1::2] + lvl[1::2, 1::2])
        np.testing.assert_array_equal(np.asarray(got), lvl)
    assert chain[-1].shape == (2, 1, 3)


def test_odd_dims_have_single_level():
    assert _num_mip_levels(15, 16) == 1
    tex = Texture(data=jnp.ones((15, 16, 3)), filter="trilinear")
    u, v = _uv_grid(4, 4)
    out = sample_texture_planes_trilinear(tex, u, v, lod=3.0)  # clamps to 0
    np.testing.assert_array_equal(np.asarray(out[0]), 1.0)


@pytest.mark.parametrize("wrap", ["repeat", "clamp"])
@pytest.mark.parametrize("k", [0, 1, 2, 4])
def test_integer_lod_equals_bilinear_of_level(k, wrap):
    """Trilinear at lod=k must BIT-equal bilinear-sampling mip level k
    as its own texture (same table construction, same lerp expression,
    level blend multiplies by exactly zero)."""
    data = jnp.asarray(_rng(2).random((32, 16, 3), dtype=np.float32))
    tri = Texture(data=data, filter="trilinear", wrap=wrap)
    level_k = _mip_chain(data)[k]
    bil = Texture(data=level_k, filter="bilinear", wrap=wrap)
    u, v = _uv_grid(8, 8, u_span=1.3, v_span=0.9, u0=-0.2)
    got = sample_texture_planes_trilinear(tri, u, v, lod=float(k))
    want = sample_texture_planes(bil, u, v)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_low_derivative_uv_defaults_to_level0():
    """A uv grid magnified past 1:1 (footprint < 1 texel/pixel) clamps
    the derived LOD to 0 — trilinear == plain bilinear, bit-equal."""
    data = jnp.asarray(_rng(3).random((32, 32, 3), dtype=np.float32))
    u, v = _uv_grid(64, 64, u_span=0.5, v_span=0.5)  # 0.25 texel/pixel
    got = sample_texture_planes(
        Texture(data=data, filter="trilinear"), u, v)
    want = sample_texture_planes(
        Texture(data=data, filter="bilinear"), u, v)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_screen_lod_analytic_footprints():
    th = tw = 64
    # u advances s texels per pixel column; v constant per row.
    for s in (1.0, 2.0, 8.0):
        u, v = _uv_grid(16, 16, u_span=16 * s / tw, v_span=0.1)
        lod = screen_lod(u, v, th, tw)
        # max(x-footprint, y-footprint): y-footprint = 0.1*64/16 = 0.4.
        want = np.log2(max(s, 0.4))
        np.testing.assert_allclose(np.asarray(lod), want, atol=1e-5)
    # The max rule picks the larger axis when v dominates.
    u, v = _uv_grid(16, 16, u_span=0.1, v_span=16 * 4.0 / th)
    np.testing.assert_allclose(np.asarray(screen_lod(u, v, th, tw)), 2.0,
                               atol=1e-5)


def test_fractional_lod_blends_adjacent_levels():
    """2-periodic checkerboard: level 1 is exactly 0.5 everywhere, so a
    lod-0.5 sample is 0.5*bilinear(level0) + 0.25."""
    base = np.indices((8, 8)).sum(0) % 2
    data = jnp.asarray(np.repeat(base[..., None], 3, -1).astype(np.float32))
    tri = Texture(data=data, filter="trilinear")
    bil = Texture(data=data, filter="bilinear")
    u, v = _uv_grid(8, 8, u_span=0.7, v_span=0.7)
    got = sample_texture_planes_trilinear(tri, u, v, lod=0.5)
    l0 = sample_texture_planes(bil, u, v)
    for g, a in zip(got, l0):
        np.testing.assert_allclose(np.asarray(g),
                                   0.5 * np.asarray(a) + 0.25, atol=1e-6)


def test_gradients_flow_through_pyramid():
    """d/d(texels) of a lod-1 sample: in-graph table build for traced
    data (Texture.__post_init__ skips precompute), gradients spread over
    the level-1 box-average's 2x2 support."""
    data0 = jnp.asarray(_rng(4).random((8, 8, 3), dtype=np.float32))
    u, v = _uv_grid(4, 4, u_span=0.8)

    def loss(data):
        tex = Texture(data=data, filter="trilinear")
        assert tex.table is None  # traced -> no precompute
        out = sample_texture_planes_trilinear(tex, u, v, lod=1.0)
        return sum(jnp.sum(o) for o in out)

    g = jax.grad(loss)(data0)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0
    # lod=1 touches ONLY level 1 -> every level-1 texel's gradient is
    # shared equally by its 2x2 base-texel box.
    gn = np.asarray(g)
    np.testing.assert_allclose(gn[0::2, 0::2], gn[1::2, 1::2], atol=1e-6)


def test_precomputed_pyramid_matches_ingraph_build():
    data = jnp.asarray(_rng(5).random((16, 16, 3), dtype=np.float32))
    pre = Texture(data=data, filter="trilinear")
    assert pre.table is not None and pre.table_pack == 1

    @jax.jit
    def sample_traced(d, u, v):
        return sample_texture_planes_trilinear(
            Texture(data=d, filter="trilinear"), u, v, lod=0.7)

    u, v = _uv_grid(8, 8)
    got_pre = sample_texture_planes_trilinear(pre, u, v, lod=0.7)
    got_tr = sample_traced(data, u, v)
    for a, b in zip(got_pre, got_tr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("coverage", ["partial", "full"])
def test_compacted_trilinear_equals_plain(coverage):
    """The compacted tier chain (engaged tier AND the over-top-tier
    fallback) equals the plain trilinear sampler per covered pixel.

    Same gather rows, same log2/lerp expressions on the same values —
    but XLA contracts the lerp's mul+add into FMAs differently per
    fusion context (the compacted expressions sit behind gathers), so
    the CPU assertion is the repo's documented contraction class: ~1 ulp
    (observed max 6e-8 at values ~0.5; same class as the FE kernel's
    CPU check, tests/test_frontend.py). The fused path routes trilinear
    through this (ops/shading.py finish_fused)."""
    rng = _rng(7)
    data = jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))
    tex = Texture(data=data, filter="trilinear")
    h, w = 16, 256  # ns = 32 segments of 128
    # Magnification varies per row so the lod spans several levels.
    scale = (1.0 + np.arange(h, dtype=np.float32))[:, None] / 2.0
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    ys = (np.arange(h, dtype=np.float32)[:, None] + 0.5) / h
    u = jnp.asarray(np.broadcast_to(xs, (h, w)) * scale)
    v = jnp.asarray(np.broadcast_to(ys, (h, w)) * (0.5 + scale / 3.0))
    if coverage == "partial":
        cov = rng.random((h, w)) < 0.3
        cov[:6] = False  # some fully-uncovered segments
    else:
        cov = np.ones((h, w), bool)  # n_cov over the top tier -> fallback
    covered = jnp.asarray(cov)
    got = sample_texture_planes_trilinear_compacted(tex, u, v, covered)
    want = sample_texture_planes_trilinear(tex, u, v)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[cov],
                                   np.asarray(w_)[cov],
                                   rtol=0, atol=2e-7)


def test_render_end_to_end_trilinear():
    """The render path routes trilinear through the plain planar sampler
    (the compacted fast path stays bilinear-only): a minified textured
    scene renders finite, covered pixels stay in the texel range, and
    the reference/binned backends agree on coverage."""
    import software_renderer_tpu as sr
    from software_renderer_tpu.models import scenes

    # width 128 = one COMPACT_SEG: the binned render exercises the
    # compacted trilinear route in finish_fused.
    rp = scenes.config2_textured_cube(0.4, width=128, height=64)
    tri_tex = Texture(data=rp.texture.data, filter="trilinear",
                      wrap=rp.texture.wrap)
    rp = dataclasses.replace(rp, texture=tri_tex)
    fb_ref = sr.render(rp, backend="reference")
    c_ref = np.asarray(fb_ref.color)
    assert np.isfinite(c_ref).all()
    cov = c_ref[..., 3] == 1.0
    assert cov.any()
    fb_bin = sr.render(rp, backend="binned")
    c_bin = np.asarray(fb_bin.color)
    np.testing.assert_array_equal(c_bin[..., 3], c_ref[..., 3])
    # Same uv planes + same sampler math; differences stay in the
    # documented cross-backend shading ulp class.
    d = np.abs(c_bin[cov] - c_ref[cov]).max()
    assert d < 2e-3, d
