"""Shared adversarial scenes used by both the CPU test suite and the
on-hardware gate (tools/tpu_gate.py) — one scene definition, two
platforms, two tolerance classes (see compare.py)."""

from __future__ import annotations

import numpy as np


def fe_gate_scene():
    """The adversarial front-end scene (degenerate + behind-eye +
    non-finite triangles; T = 9000, above PALLAS_FE_MIN_T and a
    non-multiple of the FE kernel block) run through BOTH front-ends
    inside jit (production always jits; eager XLA skips the mul+add
    contraction jit applies).

    Returns (ps_xla, ps_pallas, corners, transform). The CPU suite
    asserts the contraction class on the pair (tests/test_frontend.py,
    tolerances derived from corners/transform in f64); the TPU gate
    asserts full bit-equality (tools/tpu_gate.py check_fe_kernel).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import frontend as fe

    rng = np.random.default_rng(11)
    t = 9000
    corners = rng.uniform(-1.5, 1.5, size=(t, 3, 3)).astype(np.float32)
    corners[5] = corners[5][0]       # degenerate (zero area)
    corners[17, :, 2] = -5.0         # behind the near plane
    corners[33] = np.inf             # non-finite
    m = np.eye(4, dtype=np.float32)
    m[3, 2] = 1.0
    cc = fe.corner_cols(jnp.asarray(corners))

    def run(pallas):
        f = jax.jit(lambda cc, m: fe.planar_front(
            cc, m, 320, 200, cull_backfaces=True, pallas=pallas))
        return f(cc, jnp.asarray(m))

    return run(False), run(True), corners, m
