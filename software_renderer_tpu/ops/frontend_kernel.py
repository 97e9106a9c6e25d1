"""Single-pass Pallas front-end kernel (vertex transform + setup).

The planar XLA front-end (ops/frontend.py planar_front) is a chain of
~200 elementwise ops over [T] f32 columns. It moves only ~13 MB at
1080p/100k triangles yet measured **1.91 ms/frame** on v5e
(tools/microbench_planar_split.py) — the cost is XLA's scheduling of a
long thin elementwise chain, not arithmetic or bandwidth (the [wtot, T]
stack + transpose after it measured FREE). This kernel runs the SAME
traced math body (frontend._front_math — one source of truth) as ONE
Pallas pass over [BLOCK_ROWS, 128] column blocks. Equality with the XLA
path is bit-exact on TPU (asserted on hardware by tools/tpu_gate.py
check_fe_kernel) and contraction-class on CPU (FMA contraction is a
per-compiler, per-shape codegen decision — see frontend._front_math's
numerics note and tests/test_frontend.py).

Reference parity: this is the TPU counterpart of the reference's vertex
stage (renderer/Shaders.metal:57-76 vertex_shader + Renderer.swift:
159-163 matrix application), fused with triangle setup, which the
reference recomputes per pixel instead (Shaders.metal:123-145).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clip import CLIP_EPS

# Sublane rows per grid step; each block covers BLOCK_ROWS * 128
# triangles. 64 rows x 128 lanes x (9 in + 24 out) f32 = ~1 MB of VMEM
# per step — small enough to double-buffer, large enough that the
# per-step overhead (~5 us on v5e) amortizes.
BLOCK_ROWS = 64
LANES = 128
N_OUT_ROWS = 24


def _fe_kernel(m_ref, x1, y1, z1, x2, y2, z2, x3, y3, z3, out_ref, *,
               width: int, height: int, t: int, cull_backfaces: bool,
               front_face_ccw: bool, near_eps: float):
    from .frontend import _front_math
    mm = tuple(m_ref[0, k] for k in range(16))
    # Padding lanes (block tail past T) must come out invalid: fold the
    # in-range test in exactly like planar_front's extra_valid.
    pid = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
    gid = (pid * BLOCK_ROWS + row) * LANES + col
    in_range = gid < t
    cc = ((x1[...], y1[...], z1[...]),
          (x2[...], y2[...], z2[...]),
          (x3[...], y3[...], z3[...]))
    outs = _front_math(cc, mm, width, height,
                       cull_backfaces=cull_backfaces,
                       front_face_ccw=front_face_ccw,
                       near_eps=near_eps, extra_valid=in_range)
    for j, val in enumerate(outs):
        out_ref[j] = val.astype(jnp.float32)


def planar_front_pallas(corners_c, transform, width, height, *,
                        cull_backfaces: bool = False,
                        front_face_ccw: bool = True,
                        near_eps: float = CLIP_EPS,
                        extra_valid=None,
                        interpret: bool | None = None):
    """Drop-in planar_front via the fused Pallas pass.

    Returns the same PlanarSetup a pallas=False planar_front returns —
    bit-equal on TPU (asserted by tools/tpu_gate.py check_fe_kernel,
    GATE_r04.log), contraction-class on CPU (module docstring).
    """
    from .frontend import PlanarSetup
    from .rasterize_pallas import default_interpret
    if interpret is None:
        interpret = default_interpret()
    t = corners_c[0][0].shape[0]
    block = BLOCK_ROWS * LANES
    tp = max(-(-t // block), 1) * block
    pad = tp - t

    def prep(col):
        col = col.astype(jnp.float32)
        if pad:
            col = jnp.pad(col, (0, pad))
        return col.reshape(tp // LANES, LANES)

    cols = [prep(c) for corner in corners_c for c in corner]
    if extra_valid is not None:
        # No production caller passes extra_valid on the Pallas route
        # (render.py's clip path uses the array front-end); supportable
        # as a 10th input column if one appears.
        raise NotImplementedError(
            "planar_front_pallas does not take extra_valid; "
            "call planar_front(..., pallas=False)")
    m = jnp.asarray(transform, jnp.float32).reshape(1, 16)
    grid = tp // block
    kernel = functools.partial(
        _fe_kernel, width=width, height=height, t=t,
        cull_backfaces=cull_backfaces, front_face_ccw=front_face_ccw,
        # A jnp scalar (the CLIP_EPS default) would be a captured kernel
        # constant; the float round-trips the f32 value exactly.
        near_eps=float(near_eps))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0))] * 9,
        out_specs=pl.BlockSpec((N_OUT_ROWS, BLOCK_ROWS, LANES),
                               lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (N_OUT_ROWS, tp // LANES, LANES), jnp.float32),
        interpret=interpret,
    )(m, *cols)

    rows = [out[j].reshape(tp)[:t] for j in range(N_OUT_ROWS)]
    (a0, a1, a2, b0, b1, b2, c0, c1, c2, zx, zy, zc, abs_d, inv_area,
     area2, bx0f, by0f, bx1f, by1f, validf, w1, w2, w3, safef) = rows
    return PlanarSetup(
        a0=a0, a1=a1, a2=a2, b0=b0, b1=b1, b2=b2, c0=c0, c1=c1, c2=c2,
        zx=zx, zy=zy, zc=zc, abs_d=abs_d, inv_area=inv_area, area2=area2,
        bx0=bx0f.astype(jnp.int32), by0=by0f.astype(jnp.int32),
        bx1=bx1f.astype(jnp.int32), by1=by1f.astype(jnp.int32),
        valid=validf != 0.0, w1=w1, w2=w2, w3=w3, safe=safef != 0.0)
