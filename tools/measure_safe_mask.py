"""Probe: how many triangles does ops/setup.py coverage_safe flag as
numerically UNSAFE (not provably bbox-contained) across the benchmark
animations?

The safe mask routes flagged triangles to the bbox-clamping overflow
waves; a nonzero count on a bench scene would make every such frame pay
a merge wave, so the expected (and required-for-perf) answer on all
bench configs is ZERO — the mask exists for adversarial sliver content
(tests/test_fuzz.py), not real scenes.

Run on CPU: python tools/measure_safe_mask.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.ops import frontend as fe  # noqa: E402


def flagged(rp):
    mesh = rp.mesh
    corners = np.asarray(mesh.positions)[np.asarray(mesh.indices)].reshape(
        -1, 3, 3)
    ps = fe.planar_front(fe.corner_cols(corners), rp.transform,
                         rp.width, rp.height,
                         cull_backfaces=rp.cull_backfaces, pallas=False)
    valid = np.asarray(ps.valid)
    unsafe = valid & ~np.asarray(ps.safe)
    return int(unsafe.sum()), int(valid.sum())


for name, fn in (("config1", scenes.config1_flat_cube),
                 ("config2", scenes.config2_textured_cube),
                 ("config3", scenes.config3_phong_mesh),
                 ("config4", scenes.config4_many_objects)):
    worst = None
    for time in np.linspace(0.0, 4.0, 21):
        u, v = flagged(fn(float(time)))
        if worst is None or u > worst[0]:
            worst = (u, v, float(time))
    print(f"{name}: worst unsafe {worst[0]} / {worst[1]} valid "
          f"(t={worst[2]:.1f})")
