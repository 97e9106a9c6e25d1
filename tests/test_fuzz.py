"""Adversarial fuzz for the binned machinery (round-3 verdict item 8).

The ``619a060`` truncation bug (the banded layout's last partial chunk
silently unreachable) was found by accident during a prototype; this
suite makes that bug class systematic: randomized scenes — viewport dims
that are NOT multiples of the 64x128 tile, degenerate / huge /
behind-eye / non-finite triangles, T from 1 to thousands, bands on/off,
pathologically small pair budgets (forcing the overflow waves), row
slices with odd offsets — asserted coverage/depth-EXACT against the
always-correct reference backend (itself oracle-golden,
tests/test_raster_golden.py) in interpret mode, plus a direct
numpy-oracle cross-check on a subset.

Compile-cost discipline: the sweep reuses a small set of STATIC
configurations (shape + budget + bands + slice) and varies only the
scene CONTENT per seed, so the interpret-mode kernels compile once per
configuration and the 50+ seeds run from cache.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from software_renderer_tpu.ops import frontend as fe
from software_renderer_tpu.ops.binning import (
    binned_pipeline, fused_pipeline, visibility_binned)
from software_renderer_tpu.ops.rasterize_ref import visibility_ref
from software_renderer_tpu.ops.shading import shading_params


def fuzz_corners(seed: int, t: int, huge: bool = True,
                 with_info: bool = False):
    """[t, 3, 3] model-space corners with adversarial injections.

    huge=False skips the many-tile-spanning scaling — used by the
    numpy-oracle subset, whose f32 barycentric-division inside test is
    only product-exact for on-screen-scale coordinates (the framework's
    sign-folded integer edges are compared exactly against the reference
    backend for the huge class instead).

    with_info=True additionally returns the HUGE triangle index set: a
    many-tile sliver's attribute-plane coefficients are large and cancel
    on-pixel, so shaded values on its pixels live in a magnitude-scaled
    error class rather than the tight one (the epilogue fuzz compares
    those pixels for finiteness only)."""
    rng = np.random.default_rng(1000 + seed)
    corners = rng.uniform(-1.4, 1.4, size=(t, 3, 3)).astype(np.float32)
    n_bad = max(t // 8, 1)

    def pick(n):
        return rng.choice(t, size=min(n, t), replace=False)

    for i in pick(n_bad):           # degenerate: repeated corner
        corners[i, rng.integers(3)] = corners[i, 0]
    for i in pick(n_bad):           # collinear (zero area, distinct pts)
        corners[i, 2] = 0.5 * (corners[i, 0] + corners[i, 1])
    huge_ids = np.zeros(0, np.int64)
    if huge:
        huge_ids = pick(n_bad)      # huge: spans many tiles / offscreen
        for i in huge_ids:
            corners[i, :, :2] *= rng.uniform(10.0, 60.0)
    for i in pick(n_bad):           # behind / straddling the eye plane
        corners[i, :, 2] = rng.uniform(-6.0, -0.9, size=3)
    for i in pick(max(t // 32, 1)):  # non-finite
        corners[i, rng.integers(3), rng.integers(3)] = (
            np.inf if rng.random() < 0.5 else np.nan)
    if with_info:
        return corners, huge_ids
    return corners


def front(seed: int, t: int, w: int, h: int, cull: bool,
          huge: bool = True):
    corners = fuzz_corners(seed, t, huge=huge)
    m = np.eye(4, dtype=np.float32)
    m[3, 2] = 1.0  # w = z + 1 (the reference's projection)
    ps = fe.planar_front(fe.corner_cols(jnp.asarray(corners)),
                         jnp.asarray(m), w, h,
                         cull_backfaces=cull, pallas=False)
    return corners, m, fe.to_setup(ps)


# Static configurations — each (w, h, t, budget, y0, rows) compiles once;
# seeds vary content only. Viewports are deliberately NOT multiples of
# the 64x128 tile; budgets below ~0.3 force pair-budget overflow waves
# on most scenes; (y0, rows) exercises the row-sharded slice path.
CONFIGS = [
    # w,    h,   t,    budget, y0, rows
    (97,   61,   1,    1.5,    0,  None),   # single triangle, tiny odd vp
    (97,   61,   33,   1.5,    0,  None),
    (160,  120,  257,  0.05,   0,  None),   # pathological budget: spills
    (200,  88,   513,  0.25,   0,  None),
    (130,  170,  513,  1.5,    17, 64),     # odd row-slice offset
    (144,  96,   2200, 0.85,   0,  None),   # above FUSED_BANDS_MIN_T
]


@pytest.mark.parametrize("seed", range(36))
def test_fuzz_binned_matches_reference(seed):
    w, h, t, budget, y0, rows = CONFIGS[seed % len(CONFIGS)]
    out_h = h if rows is None else rows
    corners, m, setup = front(seed, t, w, h, cull=bool(seed % 2))
    d_ref, id_ref = visibility_ref(setup, width=w, height=out_h,
                                   y_start=y0)
    d_b, id_b = visibility_binned(setup, width=w, height=out_h,
                                  y_start=y0, pair_budget_factor=budget)
    np.testing.assert_array_equal(
        np.asarray(id_b), np.asarray(id_ref),
        err_msg=f"coverage/winner mismatch seed={seed} cfg={w}x{h} t={t} "
                f"budget={budget} y0={y0}")
    np.testing.assert_array_equal(
        np.asarray(d_b), np.asarray(d_ref),
        err_msg=f"depth mismatch seed={seed}")


@pytest.mark.parametrize("seed", range(36, 48))
@pytest.mark.parametrize("bands", [1, 4])
def test_fuzz_fused_bands_match_reference(seed, bands):
    """The FUSED kernel (banded and full-tile) + a G-buffer channel, on
    adversarial content: depth/ids exact vs the reference backend, the
    interpolated attribute plane-exact at covered pixels."""
    w, h, t, budget, y0, rows = CONFIGS[seed % len(CONFIGS)]
    out_h = h if rows is None else rows
    corners, m, setup = front(seed, t, w, h, cull=bool(seed % 2))
    rng = np.random.default_rng(seed)
    attrs = jnp.asarray(rng.uniform(0, 1, size=(t, 3, 1)).astype(np.float32))
    params = shading_params(None, flat_color=jnp.ones((3,), jnp.float32))
    epi = lambda planes, covered, p: [planes[0]]
    d_f, id_f, out = fused_pipeline(
        setup, attrs, params, width=w, height=out_h, epilogue=epi,
        n_out=1, y_start=y0, pair_budget_factor=budget, bands=bands)
    d_ref, id_ref = visibility_ref(setup, width=w, height=out_h,
                                   y_start=y0)
    np.testing.assert_array_equal(
        np.asarray(id_f), np.asarray(id_ref),
        err_msg=f"fused coverage mismatch seed={seed} bands={bands}")
    np.testing.assert_array_equal(
        np.asarray(d_f), np.asarray(d_ref),
        err_msg=f"fused depth mismatch seed={seed} bands={bands}")
    # The G-buffer value at covered pixels: plane evaluation in-kernel vs
    # the same affine plane evaluated in numpy (documented FMA ulp class).
    cov = np.asarray(id_ref) != -1
    if cov.any():
        from software_renderer_tpu.ops.binning import attribute_planes
        planes = np.asarray(attribute_planes(setup, attrs))[..., :]  # [T,1,3]
        yy, xx = np.nonzero(cov)
        tid = np.asarray(id_ref)[yy, xx]
        px = xx + 0.5
        py = yy + y0 + 0.5
        want = (planes[tid, 0, 0] * px + planes[tid, 0, 1] * py
                + planes[tid, 0, 2])
        got = np.asarray(out)[0][yy, xx]
        # FMA-chain ulp class scaled by the plane-term magnitudes (huge
        # sliver triangles have large coefficients whose on-pixel
        # cancellation amplifies raw relative error).
        tol = 1e-5 * (np.abs(planes[tid, 0, 0] * px)
                      + np.abs(planes[tid, 0, 1] * py)
                      + np.abs(planes[tid, 0, 2])) + 1e-4
        bad = np.abs(got - want) > tol
        assert not bad.any(), (
            f"gbuffer seed={seed} bands={bands}: {int(bad.sum())} pixels "
            f"beyond the plane-eval ulp class: {got[bad][:4]} vs "
            f"{want[bad][:4]}")


@pytest.mark.parametrize("seed", range(48, 54))
def test_fuzz_binned_matches_numpy_oracle(seed):
    """Direct scalar-oracle cross-check (independent of every JAX path):
    winner ids + coverage from the binned pipeline vs oracle_rasterize on
    the SAME screen coordinates."""
    from software_renderer_tpu.testing.oracle import oracle_rasterize
    w, h, t = 160, 120, 97
    corners, m, setup = front(seed, t, w, h, cull=False, huge=False)
    d_b, id_b = visibility_binned(setup, width=w, height=h,
                                  pair_budget_factor=1.5)
    # Oracle screen coords: the identical planar chains in numpy f32.
    c64 = corners.astype(np.float32)
    screen = np.zeros((t * 3, 3), np.float32)
    tris = np.arange(t * 3).reshape(t, 3)
    for k in range(3):
        X, Y, Z = c64[:, k, 0], c64[:, k, 1], c64[:, k, 2]
        with np.errstate(invalid="ignore", over="ignore", divide="ignore"):
            cw = (m[3, 0] * X + m[3, 1] * Y + m[3, 2] * Z
                  + m[3, 3]).astype(np.float32)
            wg = np.where(cw == 0.0, np.float32(1.0), cw)
            u = (X / wg) * np.float32(0.5) + np.float32(0.5)
            v = (Y / wg) * np.float32(-0.5) + np.float32(0.5)
            sx = np.sign(u * w) * np.floor(np.abs(u * w) + np.float32(0.5))
            sy = np.sign(v * h) * np.floor(np.abs(v * h) + np.float32(0.5))
            sz = (Z / wg).astype(np.float32)
        screen[tris[:, k]] = np.stack([sx, sy, sz], axis=-1)
    # The oracle rasterizes triangles the front-end culls (behind-eye /
    # offscreen-garbage); restrict the comparison to pixels whose oracle
    # winner is a front-end-valid triangle, and require the pipelines to
    # agree there. Pixels the oracle leaves empty must be empty.
    colors_tri = np.ones((t, 3, 3), np.float32)
    valid = np.asarray(setup.valid)
    keep = np.where(valid)[0]
    _, d_orc, id_orc = oracle_rasterize(
        screen, tris[keep], colors_tri[keep], w, h)
    id_orc_mapped = np.where(id_orc == -1, -1, keep[np.clip(id_orc, 0, None)])
    np.testing.assert_array_equal(np.asarray(id_b), id_orc_mapped,
                                  err_msg=f"oracle winner seed={seed}")
    fin = np.isfinite(d_orc)
    np.testing.assert_array_equal(np.isfinite(np.asarray(d_b)), fin)


# ---- fused epilogue fuzz (round-5 verdict item 7) ----------------------
#
# The coverage/depth fuzz above stops at the visibility buffer; the
# 619a060 and sliver-bbox bug classes both lived BELOW the coverage
# layer, so the next one will live in the shaded epilogue: attribute
# planes, the in-kernel perspective divide, texture compaction, Phong.
# These cases push the same adversarial content through the PUBLIC
# render API on both backends and assert:
#   * coverage (alpha) and depth bit-exact (same planar FE, exact edges);
#   * RGB on covered pixels whose winner is a normal-scale triangle
#     within the documented cross-resolve ulp classes (plane evaluation
#     vs barycentric dot: 1e-3; +texture/Phong/perspective: 2e-3 — the
#     classes of tests/test_binning.py and tests/test_perspective.py);
#   * RGB on huge-sliver winners finite on both backends (their plane
#     coefficients cancel on-pixel; error is magnitude-scaled there).

import software_renderer_tpu as sr


def _smooth_texture(rng, n=16, c=3, wrap="repeat"):
    """Low-res random texture, box-blurred once: bilinear sampling of a
    smooth texture is Lipschitz in (u, v), so plane-eval ulp differences
    in u/v map to bounded color differences (a checkerboard would
    amplify them into full-range flips at tile edges)."""
    from software_renderer_tpu.ops.texture import Texture
    d = rng.random((n, n, c)).astype(np.float32)
    d = 0.25 * (d + np.roll(d, 1, 0) + np.roll(d, 1, 1)
                + np.roll(np.roll(d, 1, 0), 1, 1))
    return Texture(data=jnp.asarray(d), filter="bilinear", wrap=wrap)


def fuzz_shaded_rp(seed: int, t: int, w: int, h: int, shading: str,
                   pc: bool):
    """Adversarial RenderPass + the huge-triangle id set for masking."""
    corners, huge_ids = fuzz_corners(seed, t, with_info=True)
    rng = np.random.default_rng(2000 + seed)
    positions = corners.reshape(-1, 3)
    indices = np.arange(3 * t, dtype=np.int32)
    colors = rng.uniform(0, 1, size=(3 * t, 3)).astype(np.float32)
    normals = rng.normal(size=(3 * t, 3)).astype(np.float32)
    normals /= np.maximum(
        np.linalg.norm(normals, axis=1, keepdims=True), 1e-6)
    uvs = rng.uniform(-0.25, 1.25, size=(3 * t, 2)).astype(np.float32)
    mesh = sr.mesh_from_numpy(positions, indices, colors=colors,
                              normals=normals, uvs=uvs)
    m = np.eye(4, dtype=np.float32)
    m[3, 2] = 1.0                    # w = z + 1 (reference projection)
    kw = {}
    if shading == "textured":
        kw["texture"] = _smooth_texture(
            rng, wrap="repeat" if seed % 2 else "clamp")
    if shading == "phong":
        kw["light"] = sr.Light(
            direction=jnp.asarray(rng.normal(size=3), jnp.float32),
            color=jnp.asarray([1.0, 0.9, 0.8], jnp.float32),
            ambient=jnp.asarray([0.1, 0.1, 0.15], jnp.float32),
            specular=jnp.asarray([0.4, 0.4, 0.4], jnp.float32),
            shininess=jnp.float32(16.0),
        )
        th = 0.3
        c, s = np.cos(th), np.sin(th)
        model = np.eye(4, dtype=np.float32)
        model[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
        kw["model"] = jnp.asarray(model)
    rp = sr.RenderPass(mesh=mesh, transform=jnp.asarray(m), width=w,
                       height=h, shading=shading, perspective_correct=pc,
                       cull_backfaces=bool(seed % 2), **kw)
    return rp, huge_ids


# (w, h, t, shading, perspective_correct, atol) — each tuple compiles
# both backends once; seeds vary scene content only.
EPI_CONFIGS = [
    (97,  61,  33,   "vertex",   False, 1e-3),
    (160, 120, 257,  "textured", False, 2e-3),
    (200, 88,  257,  "textured", True,  2e-3),
    (130, 170, 257,  "phong",    False, 2e-3),
    (144, 96,  2200, "vertex",   True,  1e-3),  # banded fused kernel
]


def _winner_ids(rp, y0=0, rows=None):
    """Reference-backend winner ids for masking (same planar FE as the
    public render path, so ids match what both backends resolved)."""
    tris = rp.mesh.triangles()
    ps = fe.planar_front(fe.corner_cols(rp.mesh.positions[tris]),
                         rp.transform, rp.width, rp.height,
                         cull_backfaces=rp.cull_backfaces, pallas=False)
    _, ids = visibility_ref(fe.to_setup(ps), width=rp.width,
                            height=rp.height if rows is None else rows,
                            y_start=y0)
    return np.asarray(ids)


def _assert_epilogue_match(fb_ref, fb_bin, ids, huge_ids, atol, msg):
    c_ref = np.asarray(fb_ref.color)
    c_bin = np.asarray(fb_bin.color)
    np.testing.assert_array_equal(c_ref[..., 3], c_bin[..., 3],
                                  err_msg=f"coverage {msg}")
    np.testing.assert_array_equal(np.asarray(fb_ref.depth),
                                  np.asarray(fb_bin.depth),
                                  err_msg=f"depth {msg}")
    covered = ids != -1
    tight = covered & ~np.isin(ids, huge_ids)
    assert covered.sum() > 0, f"degenerate fuzz scene (no coverage) {msg}"
    np.testing.assert_allclose(c_bin[tight], c_ref[tight], atol=atol,
                               err_msg=f"rgb (normal-scale winners) {msg}")
    sliver = covered & ~tight
    if sliver.any():
        assert np.isfinite(c_bin[sliver]).all(), f"non-finite binned {msg}"
        assert np.isfinite(c_ref[sliver]).all(), f"non-finite ref {msg}"


@pytest.mark.parametrize("seed", range(54, 64))
def test_fuzz_fused_epilogue_matches_reference(seed):
    w, h, t, shading, pc, atol = EPI_CONFIGS[seed % len(EPI_CONFIGS)]
    rp, huge_ids = fuzz_shaded_rp(seed, t, w, h, shading, pc)
    fb_ref = sr.render(rp, backend="reference")
    fb_bin = sr.render(rp, backend="binned")
    _assert_epilogue_match(fb_ref, fb_bin, _winner_ids(rp), huge_ids, atol,
                           f"seed={seed} {shading} pc={pc} {w}x{h} t={t}")


@pytest.mark.parametrize("seed", range(64, 68))
def test_fuzz_fused_epilogue_budget_and_rows(seed, monkeypatch):
    """The epilogue under pathological pair budgets (overflow waves carry
    attribute planes too) and odd row slices (y_start offsets the
    in-kernel pixel centers the epilogue evaluates planes at)."""
    monkeypatch.setenv("SR_PAIR_BUDGET", "0.05")
    w, h, t, shading, pc, atol = (120, 150, 257, "textured", True, 2e-3)
    y0, rows = 17, 64
    rp, huge_ids = fuzz_shaded_rp(seed, t, w, h, shading, pc)
    fb_ref = sr.render_rows(rp, y0, rows, backend="reference")
    fb_bin = sr.render_rows(rp, y0, rows, backend="binned")
    _assert_epilogue_match(fb_ref, fb_bin, _winner_ids(rp, y0, rows),
                           huge_ids, atol,
                           f"seed={seed} budget=0.05 rows=[{y0},{y0 + rows})")
