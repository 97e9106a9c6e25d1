"""Windowed Mosaic texture sampler (ops/texture_kernel.py) vs the XLA
sampler: covered lanes must match within the cross-compiler
FMA-contraction class (the gathers move exact f32 texels; only the lerp
contraction can differ between Mosaic/interpret and XLA fusions —
documented ulp class, same as tests/test_shading.py's compacted cases).

Reference parity: the reference drops its UVs and never samples
(App.swift:129-133); this path implements the north star's bilinear
texturing (BASELINE.json configs 2/4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from software_renderer_tpu.ops.texture import (
    Texture, sample_texture_planes, sample_texture_planes_compacted)
from software_renderer_tpu.ops.texture_kernel import (
    WIN_STRIDE, sample_segments_windowed, windowed_count, windowed_prep,
    windowed_supported, windowed_tables)

# Lerp-of-exact-texels cross-compiler contraction class: texels in
# [0, 1), fractions in [0, 1) -> |err| <= a few ulps of 1.
ULP = 1e-6


def _case(rng, cap, th=256, tw=256, c=3, wrap="repeat", seam=True,
          cover_p=0.8):
    data = jnp.asarray(rng.random((th, tw, c)), jnp.float32)
    v0 = rng.uniform(0, 1, size=(cap, 1))
    spread = rng.choice([0.01, 0.08, 0.9], size=(cap, 1), p=[0.7, 0.2, 0.1])
    v = v0 + rng.uniform(0, 1, size=(cap, 128)) * spread
    v = v % 1.0 if seam else np.clip(v, 0, 0.999)
    u = rng.uniform(0, 1, size=(cap, 128))
    cov = jnp.asarray(rng.random((cap, 128)) < cover_p)
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    # garbage UVs on uncovered lanes must not disturb covered lanes
    u = jnp.where(cov, u, jnp.float32(1e30))
    v = jnp.where(cov, v, jnp.float32(-3e7))
    return data, u, v, cov


def _run_windowed(data, u, v, cov, wrap):
    th, tw, c = data.shape
    tabs = windowed_tables(data, wrap)
    xa, dy, fx, fy, y0, nwin = windowed_prep(u, v, cov, th=th, tw=tw,
                                             wrap=wrap)
    return sample_segments_windowed(tabs, xa, dy, fx, fy, y0, nwin,
                                    th=th, tw=tw, wrap=wrap,
                                    interpret=True)


@pytest.mark.parametrize("wrap", ["repeat", "clamp"])
def test_windowed_matches_xla_covered(wrap):
    rng = np.random.default_rng(3)
    data, u, v, cov = _case(rng, cap=64, wrap=wrap)
    got = _run_windowed(data, u, v, cov, wrap)
    want = sample_texture_planes(Texture(data=data, wrap=wrap), u, v)
    m = np.asarray(cov)
    assert m.any() and not m.all()
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[m], np.asarray(w)[m],
                                   atol=ULP)


def test_windowed_multi_window_and_seam():
    """Wide-spread segments (several window iterations) and v-wrap-seam
    segments (window restarts past row th) stay exact."""
    rng = np.random.default_rng(4)
    th, tw, c = 256, 256, 2
    data = jnp.asarray(rng.random((th, tw, c)), jnp.float32)
    cap = 32
    # all-covered, v uniform over [0,1): spreads ~255 rows
    u = jnp.asarray(rng.uniform(0, 1, size=(cap, 128)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, size=(cap, 128)), jnp.float32)
    # plus seam rows: v in [0.99, 1.01) % 1
    v = v.at[:8].set((v[:8] * 0.02 + 0.99) % 1.0)
    cov = jnp.ones((cap, 128), bool)
    got = _run_windowed(data, u, v, cov, "repeat")
    want = sample_texture_planes(Texture(data=data), u, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=ULP)


@pytest.mark.parametrize("th,tw,c", [(128, 128, 1), (64, 512, 3),
                                     (256, 256, 4)])
def test_windowed_shapes(th, tw, c):
    rng = np.random.default_rng(5)
    assert windowed_supported(th, tw, c, 128)
    data, u, v, cov = _case(rng, cap=32, th=th, tw=tw, c=c)
    got = _run_windowed(data, u, v, cov, "repeat")
    want = sample_texture_planes(Texture(data=data), u, v)
    m = np.asarray(cov)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[m], np.asarray(w)[m],
                                   atol=ULP)


def test_windowed_prep_seam_aware_base():
    """A wrap='repeat' segment straddling the v-seam (texel rows near 0
    AND near th-1) must get a window base on the occupied arc — nwin ~ 2,
    not ~th/8 (the ADVICE r4 perf cliff: the old min-covered-row base
    walked essentially the whole texture for such segments)."""
    th = tw = 256
    # lane texel rows alternate 250..255 and 0..5 -> slabs {31, 0}
    rows = np.where(np.arange(128) % 2 == 0,
                    250 + np.arange(128) % 6, np.arange(128) % 6)
    v = jnp.asarray((rows + 0.5) / th, jnp.float32)[None, :]
    u = jnp.full((1, 128), 0.5, jnp.float32)
    cov = jnp.ones((1, 128), bool)
    _, dy, _, _, y0, nwin = windowed_prep(u, v, cov, th=th, tw=tw,
                                          wrap="repeat")
    assert int(y0[0]) == 248          # slab 31, just past the gap
    assert int(nwin[0]) == 2          # covers slabs 31 then 0
    assert int(jnp.max(dy)) < 2 * WIN_STRIDE
    # uncovered segment: nwin = 0 (kernel loop does not run)
    _, _, _, _, _, nwin0 = windowed_prep(u, v, jnp.zeros((1, 128), bool),
                                         th=th, tw=tw, wrap="repeat")
    assert int(nwin0[0]) == 0
    # and the sampled values through the kernel still match XLA exactly
    # (tiled to a whole SEG_PER_STEP grid step)
    rng = np.random.default_rng(9)
    data = jnp.asarray(rng.random((th, tw, 3)), jnp.float32)
    u32 = jnp.tile(u, (32, 1))
    v32 = jnp.tile(v, (32, 1))
    got = _run_windowed(data, u32, v32, jnp.ones((32, 128), bool), "repeat")
    want = sample_texture_planes(Texture(data=data), u32, v32)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=ULP)


def test_windowed_supported_gates():
    assert not windowed_supported(256, 100, 3, 128)   # tw not lane-tiled
    assert not windowed_supported(100, 256, 3, 128)   # th not 8-aligned
    assert not windowed_supported(256, 256, 3, 64)    # segment width
    assert not windowed_supported(1024, 1024, 4, 128)  # VMEM budget
    assert windowed_supported(256, 256, 3, 128)


def test_compacted_sampler_adaptive_mode():
    """mode='adaptive' must be value-correct in BOTH routing regimes —
    coherent UVs (total windows under budget -> kernel branch) and
    incoherent UVs (over budget -> XLA branch). Branch selection is a
    runtime lax.cond on the seam-aware window totals; which branch WINS
    is a perf property verified on hardware (docs/PERF.md), equality of
    values on covered lanes is verified here."""
    from software_renderer_tpu.ops import texture as tex_mod
    rng = np.random.default_rng(11)
    h, w = 16, 256
    data = jnp.asarray(rng.random((256, 256, 3)), jnp.float32)
    tex = Texture(data=data)
    cov = jnp.asarray(rng.random((h, w)) < 0.5)
    m = np.asarray(cov)
    u = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    v_coh = jnp.asarray(rng.uniform(0.4, 0.42, size=(h, w)), jnp.float32)
    v_inc = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    old_win, old_pack = tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK
    try:
        tex_mod.TEX_TABLE_PACK = 1
        for v in (v_coh, v_inc):
            want = sample_texture_planes(tex, u, v)
            tex_mod.TEX_WINDOWED = "adaptive"
            got = sample_texture_planes_compacted(tex, u, v, cov)
            for g, w_ in zip(got, want):
                np.testing.assert_allclose(np.asarray(g)[m],
                                           np.asarray(w_)[m], atol=ULP)
    finally:
        tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK = old_win, old_pack


def test_windowed_count_equals_prep_nwin():
    """windowed_count (the cheap adaptive predicate: bitmask occupancy +
    doubled-axis cummax) must equal windowed_prep's nwin exactly —
    random UVs, seam straddles, sparse/empty coverage, both wrap modes,
    and a tall non-multiple-of-32-slab texture (two bitmask words)."""
    rng = np.random.default_rng(21)
    for th in (256, 496):     # S = 32 (one word), S = 62 (two words)
        for wrap in ("repeat", "clamp"):
            v = jnp.asarray(np.concatenate([
                rng.uniform(-0.5, 1.5, size=(6, 128)),       # random
                rng.uniform(-0.02, 0.02, size=(2, 128)) % 1.0,  # seam
                rng.uniform(0.3, 0.31, size=(2, 128)),       # tight
            ]), jnp.float32)
            cov = jnp.asarray(rng.random((10, 128)) < 0.6)
            cov = cov.at[3].set(False)                       # empty seg
            u = jnp.asarray(rng.uniform(0, 1, size=(10, 128)), jnp.float32)
            _, _, _, _, _, want = windowed_prep(u, v, cov, th=th, tw=256,
                                                wrap=wrap)
            got = windowed_count(v, cov, th=th, wrap=wrap)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"th={th} wrap={wrap}")


def test_windowed_full_coverage_fallback():
    """When coverage exceeds the largest tier cap the chain's fallback
    runs — with the kernel route enabled that fallback is the windowed
    sampler over ALL segments (screen-filling textured surfaces are the
    coherent content class; round 5). Full-coverage frames must be
    value-equal to the XLA whole-frame path on every pixel, in forced
    and adaptive modes, including the ns % SEG_PER_STEP != 0 padding
    path (h*w/128 = 36 segments below)."""
    from software_renderer_tpu.ops import texture as tex_mod
    from software_renderer_tpu.ops import texture_kernel as tk_mod
    rng = np.random.default_rng(14)
    h, w = 18, 256                       # ns = 36: not a multiple of 32
    data = jnp.asarray(rng.random((256, 256, 3)), jnp.float32)
    tex = Texture(data=data)
    u = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    v = jnp.asarray(rng.uniform(0.40, 0.44, size=(h, w)), jnp.float32)
    cov = jnp.ones((h, w), bool)         # full coverage -> fallback
    want = sample_texture_planes(tex, u, v)
    win_calls = []
    orig = tk_mod.sample_segments_windowed

    def spy(*a, **kw):
        win_calls.append(1)
        return orig(*a, **kw)

    old_win, old_pack = tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK
    tk_mod.sample_segments_windowed = spy
    try:
        tex_mod.TEX_TABLE_PACK = 1
        for m in ("1", "adaptive"):
            tex_mod.TEX_WINDOWED = m
            got = sample_texture_planes_compacted(tex, u, v, cov)
            for g, w_ in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                           atol=ULP, err_msg=f"mode={m}")
        assert win_calls, "windowed fallback did not engage"
        # incoherent UVs in adaptive mode must take the XLA fallback
        # and still be exact
        v_inc = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
        tex_mod.TEX_WINDOWED = "adaptive"
        got = sample_texture_planes_compacted(tex, u, v_inc, cov)
        want_inc = sample_texture_planes(tex, u, v_inc)
        for g, w_ in zip(got, want_inc):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                       atol=ULP)
    finally:
        tk_mod.sample_segments_windowed = orig
        tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK = old_win, old_pack


def test_adaptive_predicate_totals():
    """The routing predicate's window totals: coherent segments count a
    couple of windows, v-spread segments count ~th/8 — the quantity the
    budget gates on (seam-aware, so a seam straddle is NOT spread)."""
    th = tw = 256
    rng = np.random.default_rng(12)
    u = jnp.asarray(rng.uniform(0, 1, size=(3, 128)), jnp.float32)
    v = jnp.stack([
        jnp.asarray(rng.uniform(0.10, 0.14, 128), jnp.float32),   # tight
        jnp.asarray((rng.uniform(-0.02, 0.02, 128) % 1.0), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, 128), jnp.float32),         # spread
    ])
    cov = jnp.ones((3, 128), bool)
    _, _, _, _, _, nwin = windowed_prep(u, v, cov, th=th, tw=tw,
                                        wrap="repeat")
    nwin = np.asarray(nwin)
    assert nwin[0] <= 3          # tight band
    assert nwin[1] <= 3          # seam straddle, seam-aware base
    assert nwin[2] >= th // WIN_STRIDE - 4   # genuinely spread


def test_compacted_sampler_windowed_equals_xla_path():
    """The full compacted entry point routed through the kernel equals
    the XLA row-gather route on covered pixels (ulp class).

    Flags are monkeypatched (not read from the environment): the
    windowed route additionally requires TEX_TABLE_PACK == 1, so both
    are forced for the kernel run and restored after — the suite must
    pass on a clean checkout regardless of SR_TEX_* settings
    (VERDICT/ADVICE r4)."""
    from software_renderer_tpu.ops import texture as tex_mod
    from software_renderer_tpu.ops import texture_kernel as tk_mod
    rng = np.random.default_rng(6)
    h, w = 16, 256
    data = jnp.asarray(rng.random((256, 256, 3)), jnp.float32)
    tex = Texture(data=data)
    u = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    covered = jnp.asarray(rng.random((h, w)) < 0.3)
    win_calls = []
    orig_sample = tk_mod.sample_segments_windowed

    def spy(*a, **kw):
        win_calls.append(1)
        return orig_sample(*a, **kw)

    old_win, old_pack = tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK
    tk_mod.sample_segments_windowed = spy
    try:
        tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK = True, 1
        got = sample_texture_planes_compacted(tex, u, v, covered)
        assert win_calls, "kernel route did not engage"
        tex_mod.TEX_WINDOWED = False
        want = sample_texture_planes_compacted(tex, u, v, covered)
    finally:
        tk_mod.sample_segments_windowed = orig_sample
        tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK = old_win, old_pack
    m = np.asarray(covered)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[m], np.asarray(w_)[m],
                                   atol=ULP)


def test_windowed_texture_gradients_flow():
    """Texture-training paths differentiate through the sampler; the
    custom VJP's XLA twin must give the same d(loss)/d(texture) as the
    XLA route (same corner weights on covered pixels).

    TEX_TABLE_PACK is forced to 1 alongside TEX_WINDOWED: use_win in
    sample_texture_planes_compacted requires pack 1, so without it the
    'windowed' leg would silently compare the XLA path against itself
    and never exercise the custom VJP (ADVICE r4 item 3). A spy asserts
    the kernel route actually ran."""
    from software_renderer_tpu.ops import texture as tex_mod
    from software_renderer_tpu.ops import texture_kernel as tk_mod
    rng = np.random.default_rng(8)
    h, w = 8, 256
    u = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, size=(h, w)), jnp.float32)
    covered = jnp.asarray(rng.random((h, w)) < 0.4)
    data0 = jnp.asarray(rng.random((256, 256, 3)), jnp.float32)
    win_calls = []
    orig_sample = tk_mod.sample_segments_windowed

    def spy(*a, **kw):
        win_calls.append(1)
        return orig_sample(*a, **kw)

    def loss(data, use_win):
        old_win, old_pack = tex_mod.TEX_WINDOWED, tex_mod.TEX_TABLE_PACK
        tex_mod.TEX_WINDOWED = use_win
        tex_mod.TEX_TABLE_PACK = 1 if use_win else old_pack
        try:
            planes = sample_texture_planes_compacted(
                Texture(data=data), u, v, covered)
        finally:
            tex_mod.TEX_WINDOWED = old_win
            tex_mod.TEX_TABLE_PACK = old_pack
        return sum(jnp.sum(jnp.where(covered, p, 0.0) ** 2)
                   for p in planes)

    tk_mod.sample_segments_windowed = spy
    try:
        g_win = jax.grad(lambda d: loss(d, True))(data0)
    finally:
        tk_mod.sample_segments_windowed = orig_sample
    assert win_calls, "kernel route did not engage in the windowed leg"
    g_xla = jax.grad(lambda d: loss(d, False))(data0)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_xla),
                               atol=2e-5, rtol=1e-5)
    assert float(jnp.max(jnp.abs(g_win))) > 0.0
