"""Planar (structure-of-arrays) geometry front-end.

The array front-end (ops/vertex.py + ops/setup.py) carries every
per-triangle quantity in ``[T, 3]`` / ``[T, 3, 3]`` / ``[T, 4]`` tensors.
On TPU those minor dims tile up to 128 lanes, so each elementwise op pays
a ~40x-padded relayout — the vertex+setup+table stages measured
3.6 ms/frame at 1080p/100k on v5e while moving only a few MB
(tools/microbench_planar.py). This module keeps every per-triangle
quantity a separate ``[T]`` array (full lane width), computes the 4x4
transform as 12 scalar FMA chains on the VPU (exact f32 — the same
per-component multiply-add order the reference's simd matrix-vector
product uses, renderer/Renderer.swift:159-163), and materializes the
combined kernel stream table with ONE ``[wtot, T] -> [T, wtot]``
transpose at the very end: 2.2 ms/frame for the whole front-end.

Semantics are identical to the array front-end (same formulas from
ops/vertex.py / ops/setup.py, same invalid-triangle fills); the numpy
oracle (testing/oracle.py) evaluates the identical chains, so golden
coverage comparisons stay exact. All render backends consume THIS
front-end on the non-clipped triangle path (``to_setup`` re-packs the
planar columns for the reference/pallas kernels), so cross-backend
coverage/depth bit-equality (tools/tpu_gate.py) is preserved by
construction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIP_EPS
from .setup import TriangleSetup
from .vertex import round_half_away


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlanarSetup:
    """Per-triangle rasterization data as separate [T] columns.

    Same contents as :class:`ops.setup.TriangleSetup` plus the per-corner
    clip-space w (for perspective-correct attributes and diagnostics).
    Edge functions: ``e_j = a_j * x + b_j * y + c_j``, inside <=> all
    ``e_j >= 0`` (sign-folded, exact f32 — see ops/setup.py numerics).
    """

    a0: jax.Array; a1: jax.Array; a2: jax.Array      # noqa: E702
    b0: jax.Array; b1: jax.Array; b2: jax.Array      # noqa: E702
    c0: jax.Array; c1: jax.Array; c2: jax.Array      # noqa: E702
    zx: jax.Array; zy: jax.Array; zc: jax.Array      # depth plane  # noqa: E702
    abs_d: jax.Array       # |D| with invalid -> 0 (kernel upper bound)
    inv_area: jax.Array    # 1/|D| (0 where invalid)
    area2: jax.Array       # signed 2*area D
    bx0: jax.Array; by0: jax.Array                   # noqa: E702
    bx1: jax.Array; by1: jax.Array                   # bbox i32, clamped  # noqa: E702
    valid: jax.Array       # [T] bool
    w1: jax.Array; w2: jax.Array; w3: jax.Array      # clip w per corner  # noqa: E702
    safe: jax.Array        # [T] bool — ops/setup.py coverage_safe

    @property
    def num_triangles(self) -> int:
        return self.a0.shape[0]


def corner_cols(corners):
    """[T, 3, 3] model-space corners -> ((x1,y1,z1), (x2,..), (x3,..)) of
    [T] columns. Transform-invariant: under a jitted frame loop XLA hoists
    these strided slices out of the loop (and CSEs them across calls)."""
    return tuple(
        (corners[:, c, 0], corners[:, c, 1], corners[:, c, 2])
        for c in range(3))


def attr_corner_cols(values):
    """[T, 3, A] per-corner attribute values -> list over A of
    (v1, v2, v3) [T] columns (hoistable like :func:`corner_cols`)."""
    a = values.shape[-1]
    return [(values[:, 0, i], values[:, 1, i], values[:, 2, i])
            for i in range(a)]


def _front_math(corners_c, mm, width, height, *,
                cull_backfaces: bool, front_face_ccw: bool,
                near_eps: float, extra_valid):
    """The planar_front math body over ANY elementwise value shape.

    Shared verbatim by the XLA path (:func:`planar_front`, [T] columns)
    and the Pallas front-end kernel (:func:`planar_front_pallas`,
    [rows, 128] blocks) — one traced op sequence, two compilers. One
    trace does NOT force bit equality everywhere: whether ``mul+add``
    contracts into an FMA is a per-compiler, per-shape codegen decision.
    On TPU, Mosaic and XLA:TPU agree and the hardware gate
    (tools/tpu_gate.py check_fe_kernel) asserts full bit-equality; on
    XLA:CPU hosts the edge/depth-plane CONSTANTS can differ by
    contraction ulps (bounded by the plane scale —
    testing/compare.py assert_fe_contraction_class) while every
    coverage-critical field (edge gradients from exactly-rounded pixel
    coordinates, bbox, validity) stays bit-exact.

    corners_c: three (X, Y, Z) value triplets; mm: the 16 transform
    scalars row-major. Returns a 24-tuple of f32/bool values:
    (a0,a1,a2, b0,b1,b2, c0,c1,c2, zx,zy,zc, abs_d, inv_area, area2,
     bx0f,by0f,bx1f,by1f [f32 exact ints], valid [bool], w1,w2,w3,
     safe [bool — ops/setup.py coverage_safe]).
    """
    # numpy literals, not jnp scalars: the Pallas kernel shares this body
    # and captured jax-array constants are rejected by pallas_call.
    wf = np.float32(width)
    hf = np.float32(height)
    xs, ys, zs, ws = [], [], [], []
    near_ok = None
    for (X, Y, Z) in corners_c:
        cx = mm[0] * X + mm[1] * Y + mm[2] * Z + mm[3]
        cy = mm[4] * X + mm[5] * Y + mm[6] * Z + mm[7]
        cz = mm[8] * X + mm[9] * Y + mm[10] * Z + mm[11]
        cw = mm[12] * X + mm[13] * Y + mm[14] * Z + mm[15]
        ok = cw > near_eps
        near_ok = ok if near_ok is None else (near_ok & ok)
        wg = jnp.where(cw == 0.0, 1.0, cw)  # render.py's divide guard
        u = (cx / wg) * 0.5 + 0.5
        v = (cy / wg) * -0.5 + 0.5
        xs.append(round_half_away(u * wf))
        ys.append(round_half_away(v * hf))
        zs.append(cz / wg)
        ws.append(cw)
    x1, x2, x3 = xs
    y1, y2, y3 = ys
    z1, z2, z3 = zs

    # --- ops/setup.py formulas, column-for-column ---
    d = (x1 - x3) * (y2 - y3) - (x2 - x3) * (y1 - y3)
    finite = (jnp.isfinite(x1) & jnp.isfinite(y1) & jnp.isfinite(z1)
              & jnp.isfinite(x2) & jnp.isfinite(y2) & jnp.isfinite(z2)
              & jnp.isfinite(x3) & jnp.isfinite(y3) & jnp.isfinite(z3))
    degenerate = ~finite | (d == 0.0)
    s = jnp.where(d < 0.0, -1.0, 1.0)
    abs_d = jnp.abs(d)
    inv_area = jnp.where(degenerate, 0.0,
                         1.0 / jnp.where(degenerate, 1.0, abs_d))
    a0 = (y2 - y3) * s
    b0 = (x3 - x2) * s
    a1 = (y3 - y1) * s
    b1 = (x1 - x3) * s
    c0 = -(a0 * x3 + b0 * y3)
    c1 = -(a1 * x3 + b1 * y3)
    a2 = -(a0 + a1)
    b2 = -(b0 + b1)
    c2 = abs_d - c0 - c1
    # Depth plane: same (coef . z) * inv_area contraction order as
    # ops/setup.py (explicit multiply-sum; exact-enough f32 — depth ulps
    # are a documented tolerance class, coverage never reads zplane).
    zx = (a0 * z1 + a1 * z2 + a2 * z3) * inv_area
    zy = (b0 * z1 + b1 * z2 + b2 * z3) * inv_area
    zc = (c0 * z1 + c1 * z2 + c2 * z3) * inv_area

    min_x = jnp.minimum(jnp.minimum(x1, x2), x3)
    max_x = jnp.maximum(jnp.maximum(x1, x2), x3)
    min_y = jnp.minimum(jnp.minimum(y1, y2), y3)
    max_y = jnp.maximum(jnp.maximum(y1, y2), y3)
    offscreen = ((max_x < 0.0) | (min_x > wf) | (max_y < 0.0)
                 | (min_y > hf))
    # Bbox kept f32 here (exact small ints — the casts happen at the
    # caller so the Pallas kernel's output blocks stay single-dtype).
    clean = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
    bx0 = jnp.clip(clean(jnp.floor(min_x)), 0, width - 1)
    by0 = jnp.clip(clean(jnp.floor(min_y)), 0, height - 1)
    bx1 = jnp.clip(clean(jnp.ceil(max_x)), 0, width - 1)
    by1 = jnp.clip(clean(jnp.ceil(max_y)), 0, height - 1)

    valid = ~degenerate & ~offscreen & near_ok
    if extra_valid is not None:
        valid = valid & extra_valid
    if cull_backfaces:
        front = (d > 0.0) if front_face_ccw else (d < 0.0)
        valid = valid & front

    # Invalid fills (ops/setup.py:152-158): e = (-1,-1,-1) via the const
    # columns, depth plane -> +inf, inv_area -> 0.
    fneg = np.float32(-1.0)
    a0 = jnp.where(valid, a0, 0.0)
    a1 = jnp.where(valid, a1, 0.0)
    a2 = jnp.where(valid, a2, 0.0)
    b0 = jnp.where(valid, b0, 0.0)
    b1 = jnp.where(valid, b1, 0.0)
    b2 = jnp.where(valid, b2, 0.0)
    c0 = jnp.where(valid, c0, fneg)
    c1 = jnp.where(valid, c1, fneg)
    c2 = jnp.where(valid, c2, fneg)
    zx = jnp.where(valid, zx, 0.0)
    zy = jnp.where(valid, zy, 0.0)
    zc = jnp.where(valid, zc, jnp.inf)
    inv_area = jnp.where(valid, inv_area, 0.0)
    from .setup import coverage_safe
    safe = coverage_safe(x1, y1, x2, y2, x3, y3, a0, b0, a1, b1,
                         abs_d, width, height) | ~valid
    # where(), not abs_d * valid: multiply-by-bool keeps NaN (non-finite
    # invalid corners) under XLA while Mosaic lowers it as a select that
    # drops it — a cross-compiler nan-location mismatch the hardware
    # gate's FE field check caught (GATE_r04.log, first run).
    return (a0, a1, a2, b0, b1, b2, c0, c1, c2, zx, zy, zc,
            jnp.where(valid, abs_d, 0.0), inv_area, d, bx0, by0, bx1, by1,
            valid, ws[0], ws[1], ws[2], safe)


# Route planar_front through the Pallas FE kernel at or above this
# triangle count (auto mode). Below it the XLA fusion is already fast
# and the kernel's block padding dominates.
PALLAS_FE_MIN_T = 4096


def planar_front(corners_c, transform, width, height, *,
                 cull_backfaces: bool = False, front_face_ccw: bool = True,
                 near_eps: float = CLIP_EPS,
                 extra_valid=None, pallas: bool | None = None) -> PlanarSetup:
    """Vertex transform + triangle setup, fully planar.

    corners_c: per-corner ((x, y, z)) [T] column triplets from
      :func:`corner_cols`.
    Semantics: ops/vertex.py (clip = M v; ndc = xyz/w; uv y-flip; pixel
    round-half-away) + ops/setup.py (sign-folded exact edge functions,
    depth plane, clamped bbox, validity fills) + render.py's default
    near-plane guard (all corner w > eps — the reference divides blindly,
    Shaders.metal:68, and rasterizes garbage for eye-plane triangles).

    pallas: None = auto (the single-pass Pallas kernel for T >=
    PALLAS_FE_MIN_T — the ~200-op XLA chain measured 1.9 ms/frame at
    100k tris on v5e while moving ~13 MB; the kernel is one pass). The
    kernel evaluates the SAME traced math (:func:`_front_math`);
    equality is bit-exact on TPU (verified on hardware by
    tools/tpu_gate.py check_fe_kernel) and contraction-class on CPU
    (tests/test_frontend.py — see the :func:`_front_math` numerics note).
    """
    t = corners_c[0][0].shape[0]
    if pallas is None:
        pallas = t >= PALLAS_FE_MIN_T and extra_valid is None
    if pallas:
        from .frontend_kernel import planar_front_pallas
        return planar_front_pallas(
            corners_c, transform, width, height,
            cull_backfaces=cull_backfaces, front_face_ccw=front_face_ccw,
            near_eps=near_eps, extra_valid=extra_valid)
    m = transform.astype(jnp.float32)
    mm = tuple(m[i, j] for i in range(4) for j in range(4))
    (a0, a1, a2, b0, b1, b2, c0, c1, c2, zx, zy, zc, abs_d, inv_area,
     area2, bx0f, by0f, bx1f, by1f, valid, w1, w2, w3, safe) = _front_math(
        corners_c, mm, width, height, cull_backfaces=cull_backfaces,
        front_face_ccw=front_face_ccw, near_eps=near_eps,
        extra_valid=extra_valid)
    return PlanarSetup(
        a0=a0, a1=a1, a2=a2, b0=b0, b1=b1, b2=b2, c0=c0, c1=c1, c2=c2,
        zx=zx, zy=zy, zc=zc, abs_d=abs_d, inv_area=inv_area,
        area2=area2, bx0=bx0f.astype(jnp.int32), by0=by0f.astype(jnp.int32),
        bx1=bx1f.astype(jnp.int32), by1=by1f.astype(jnp.int32),
        valid=valid, w1=w1, w2=w2, w3=w3, safe=safe)


def to_setup(ps: PlanarSetup) -> TriangleSetup:
    """Re-pack planar columns into the array TriangleSetup (bitwise the
    same values — pure layout). Used by the reference/pallas backends so
    every backend shares one front-end's coverage decisions."""
    coef = jnp.stack([
        jnp.stack([ps.a0, ps.a1, ps.a2], axis=-1),
        jnp.stack([ps.b0, ps.b1, ps.b2], axis=-1),
        jnp.stack([ps.c0, ps.c1, ps.c2], axis=-1),
    ], axis=-2)
    zplane = jnp.stack([ps.zx, ps.zy, ps.zc], axis=-1)
    bbox = jnp.stack([ps.bx0, ps.by0, ps.bx1, ps.by1], axis=-1)
    return TriangleSetup(coef=coef, zplane=zplane, inv_area=ps.inv_area,
                         bbox=bbox, valid=ps.valid, area2=ps.area2,
                         safe=ps.safe)


def corner_w(ps: PlanarSetup):
    """[T, 3] clip-space w (perspective-correct weights in the XLA shade
    path expect the array layout)."""
    return jnp.stack([ps.w1, ps.w2, ps.w3], axis=-1)


def attribute_plane_cols(ps: PlanarSetup, chan_vals):
    """Per-corner attribute columns -> affine plane columns.

    chan_vals: list over A of (v1, v2, v3) [T] columns. Returns a flat
    list of 3A [T] columns (x, y, const per channel) — the same
    ``(coef . vals) * inv_area`` contraction as ops/binning.py
    attribute_planes, evaluated planar.
    """
    cols = []
    for (v1, v2, v3) in chan_vals:
        cols.append((ps.a0 * v1 + ps.a1 * v2 + ps.a2 * v3) * ps.inv_area)
        cols.append((ps.b0 * v1 + ps.b1 * v2 + ps.b2 * v3) * ps.inv_area)
        cols.append((ps.c0 * v1 + ps.c1 * v2 + ps.c2 * v3) * ps.inv_area)
    return cols


def perspective_chan_vals(chan_vals, ps: PlanarSetup):
    """Planar analogue of ops/shading.py perspective_vertex_attrs:
    divide every per-corner value by its clip w and append a 1/w
    channel (attr/w and 1/w are screen-affine; the fused epilogue
    divides per pixel)."""
    iw = tuple(1.0 / jnp.where(w == 0.0, 1.0, w)
               for w in (ps.w1, ps.w2, ps.w3))
    out = [(v1 * iw[0], v2 * iw[1], v3 * iw[2])
           for (v1, v2, v3) in chan_vals]
    out.append(iw)
    return out


def stream_table_planar(ps: PlanarSetup, plane_cols):
    """Combined kernel stream table from planar columns.

    Layout identical to ops/binning.py build_stream_table (REC_BASE
    docs): one [wtot, T] stack (major-dim concat of [T] columns — no
    relayout) then ONE transpose to the row-gatherable [T, wtot].
    Returns (table, n_channels, poison_row).
    """
    t = ps.num_triangles
    a3 = len(plane_cols)
    assert a3 % 3 == 0
    ids = jnp.arange(t, dtype=jnp.float32)
    cols = [ps.a0, ps.a1, ps.b0, ps.b1, ps.c0, ps.c1, ps.abs_d,
            ps.zx, ps.zy, ps.zc, jnp.where(ps.valid, ids, -1.0)]
    cols += plane_cols
    table = jnp.stack(cols, axis=0).T  # [T, wtot]
    poison = jnp.zeros((11 + a3,), jnp.float32)
    poison = poison.at[4:6].set(-1.0)
    poison = poison.at[9].set(jnp.inf)
    poison = poison.at[10].set(-1.0)
    # Invalid triangles: the c0/c1/zc/id columns already carry their
    # poison values (planar_front fills + the id where above); the
    # remaining columns are zero there exactly like build_stream_table's
    # row-level where. abs_d is pre-masked; plane columns are
    # inv_area-scaled with inv_area = 0 -> 0... except the const plane
    # col (c2-based) — mask the whole row for exact parity:
    table = jnp.where(ps.valid[:, None], table, poison)
    return table, a3 // 3, poison


def pack_records_planar(ps: PlanarSetup, chunk: int):
    """[T_pad, 16] raster records for the unbinned/overflow kernels —
    value-identical to ops/rasterize_pallas.pack_records(to_setup(ps));
    paid only inside overflow branches (one stack of [T] columns)."""
    from .rasterize_pallas import _poison_row
    t = ps.num_triangles
    ids = jnp.arange(t, dtype=jnp.float32)
    rec = jnp.stack([
        ps.a0, ps.a1, ps.b0, ps.b1, ps.c0, ps.c1, ps.abs_d,
        ps.zx, ps.zy, ps.zc,
        ps.bx0.astype(jnp.float32), ps.by0.astype(jnp.float32),
        ps.bx1.astype(jnp.float32), ps.by1.astype(jnp.float32),
        ids, jnp.zeros((t,), jnp.float32),
    ], axis=0).T
    rec = jnp.where(ps.valid[:, None], rec, _poison_row())
    pad = (-t) % chunk
    if pad or t == 0:
        n_fill = max(pad, chunk if t == 0 else pad)
        rec = jnp.concatenate(
            [rec, jnp.tile(_poison_row()[None], (n_fill, 1))], axis=0)
    return rec
