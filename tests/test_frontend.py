"""Planar front-end (ops/frontend.py): layout identities + backend parity.

The planar front-end must be a pure LAYOUT change: to_setup / the planar
table / planar records repack the same values the array helpers produce
from them, and the binned backend consuming planar columns must make the
same coverage decisions as the reference backend consuming to_setup's
arrays (they share one front-end by construction).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import software_renderer_tpu as sr
from software_renderer_tpu.models import scenes
from software_renderer_tpu.ops import frontend as fe
from software_renderer_tpu.ops.binning import (
    attribute_planes, build_bins, build_stream_table)
from software_renderer_tpu.ops.rasterize_pallas import pack_records


def _random_scene(n=97, seed=0, w=160, h=120):
    rng = np.random.default_rng(seed)
    corners = rng.uniform(-1.2, 1.2, size=(n, 3, 3)).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[3, 2] = 1.0  # w = z + 1
    return jnp.asarray(corners), jnp.asarray(m), w, h


def _planar(corners, m, w, h, **kw):
    return fe.planar_front(fe.corner_cols(corners), m, w, h, **kw)


def test_to_setup_roundtrip_shapes_and_fills():
    corners, m, w, h = _random_scene()
    ps = _planar(corners, m, w, h)
    s = fe.to_setup(ps)
    assert s.coef.shape == (97, 3, 3)
    # Invalid triangles carry the (-1) const-column fill + inf depth.
    inv = ~np.asarray(s.valid)
    if inv.any():
        np.testing.assert_array_equal(np.asarray(s.coef)[inv][:, 2, :], -1.0)
        assert np.all(np.isinf(np.asarray(s.zplane)[inv][:, 2]))


def test_build_bins_planar_equals_array():
    corners, m, w, h = _random_scene(seed=3)
    ps = _planar(corners, m, w, h)
    s = fe.to_setup(ps)
    a = build_bins(ps, width=w, height=h)
    b = build_bins(s, width=w, height=h)
    for f in ("ids", "chunk_tile", "first_flag", "live_flag", "last_flag"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
    np.testing.assert_array_equal(np.asarray(a.overflow_mask),
                                  np.asarray(b.overflow_mask))


def test_pack_records_planar_equals_array():
    corners, m, w, h = _random_scene(seed=5)
    ps = _planar(corners, m, w, h, cull_backfaces=True)
    rec_p = fe.pack_records_planar(ps, 128)
    rec_a = pack_records(fe.to_setup(ps), 128)
    np.testing.assert_array_equal(np.asarray(rec_p), np.asarray(rec_a))


def test_stream_table_planar_equals_array():
    corners, m, w, h = _random_scene(seed=7)
    ps = _planar(corners, m, w, h)
    s = fe.to_setup(ps)
    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.uniform(0, 1, size=(97, 3, 5)).astype(np.float32))
    chan_vals = fe.attr_corner_cols(vals)
    tp, ap, pp = fe.stream_table_planar(
        ps, fe.attribute_plane_cols(ps, chan_vals))
    ta, aa, pa = build_stream_table(s, vals)
    assert ap == aa == 5
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(pa))
    # Plane columns contract in the same (a*v1 + a*v2 + a*v3) order; the
    # raster record columns are pure repacks — bit-equal end to end.
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(ta))


def test_planar_budget_prefix_is_exact():
    """The matmul cumsum budget must equal a plain int cumsum's verdict."""
    corners, m, w, h = _random_scene(n=513, seed=11)
    ps = _planar(corners, m, w, h)
    info = build_bins(ps, width=w, height=h, pair_budget_factor=0.25)
    bbox_w = (np.asarray(ps.bx1) // 128 - np.asarray(ps.bx0) // 128 + 1)
    bbox_h = (np.asarray(ps.by1) // 64).clip(0, (h - 1) // 64) \
        - (np.asarray(ps.by0) // 64).clip(0, (h - 1) // 64) + 1
    nspan = bbox_w * bbox_h
    valid = np.asarray(ps.valid)
    small = valid & (nspan <= 12)
    budget = int(-(int(-0.25 * 513) // 128) * 128)
    cum = np.cumsum(np.where(small, nspan, 0))
    binned = small & (cum <= budget)
    np.testing.assert_array_equal(np.asarray(info.overflow_mask),
                                  valid & ~binned)


@pytest.mark.parametrize("persp", [False, True])
def test_binned_planar_matches_reference_backend(persp):
    rp = scenes.reference_sphere(0.6, width=96, height=96)
    import dataclasses
    rp = dataclasses.replace(rp, perspective_correct=persp)
    fb_b = sr.render(rp, backend="binned")
    fb_r = sr.render(rp, backend="reference")
    np.testing.assert_array_equal(np.asarray(fb_b.color[..., 3]),
                                  np.asarray(fb_r.color[..., 3]))
    db, dr = np.asarray(fb_b.depth), np.asarray(fb_r.depth)
    np.testing.assert_array_equal(np.isfinite(db), np.isfinite(dr))
    fin = np.isfinite(db)
    np.testing.assert_array_equal(db[fin], dr[fin])
    np.testing.assert_allclose(np.asarray(fb_b.color), np.asarray(fb_r.color),
                               atol=2e-4)


def test_pallas_fe_kernel_matches_xla_planar_front():
    """The Pallas FE kernel (ops/frontend_kernel.py) must reproduce the
    XLA planar_front up to the cross-compiler CONTRACTION class
    (testing/compare.py assert_fe_contraction_class): coverage-critical
    fields (edge gradients, bbox, valid, areas, clip-w) bit-exact; the
    edge/depth-plane CONSTANTS may differ by FMA-contraction ulps bounded
    by the plane scale — XLA:CPU's LLVM backend decides mul+add
    contraction per shape, so sharing one traced body does not force bit
    equality on CPU. On TPU both compilers agree and the hardware gate
    (tools/tpu_gate.py check_fe_kernel) asserts FULL bit-equality on this
    exact scene."""
    from software_renderer_tpu.testing.fixtures import fe_gate_scene
    ps_x, ps_p, corners, m = fe_gate_scene()
    assert ps_p.num_triangles == 9000
    from software_renderer_tpu.testing.compare import (
        assert_fe_contraction_class)
    assert_fe_contraction_class(ps_x, ps_p, corners, m,
                                width=320, height=200,
                                context="pallas FE vs XLA planar front")
    # Injected-bug sensitivity: the class must REJECT (a) any flip of a
    # coverage-critical field and (b) constant errors beyond the
    # product-rounding bound (here: one c1 perturbed by 1% of its plane's
    # on-screen range — a real kernel bug's magnitude, not an FMA ulp).
    import dataclasses
    v = np.asarray(ps_p.valid).copy()
    i = int(np.argmax(v))
    v[i] = False
    with pytest.raises(AssertionError):
        assert_fe_contraction_class(
            ps_x, dataclasses.replace(ps_p, valid=jnp.asarray(v)),
            corners, m, width=320, height=200, context="injected")
    c1 = np.asarray(ps_p.c1).copy()
    span = (np.abs(np.asarray(ps_p.a1)[i]) * 320
            + np.abs(np.asarray(ps_p.b1)[i]) * 200)
    c1[i] += 0.01 * span
    with pytest.raises(AssertionError):
        assert_fe_contraction_class(
            ps_x, dataclasses.replace(ps_p, c1=jnp.asarray(c1)),
            corners, m, width=320, height=200, context="injected")


def test_pallas_fe_auto_threshold_routes_small_scenes_to_xla():
    corners, m, w, h = _random_scene(seed=7)  # 97 tris < PALLAS_FE_MIN_T
    ps = _planar(corners, m, w, h)            # must not touch pallas
    assert ps.num_triangles == 97
    assert fe.PALLAS_FE_MIN_T > 97
