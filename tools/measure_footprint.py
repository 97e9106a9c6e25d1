#!/usr/bin/env python
"""HBM footprint audit at the production configuration (VERDICT r4
item 8): how much device memory the north-star frame needs at budget
0.85 + the texture tier chain + the precomputed quad table, and how
much headroom the pair budget and tier caps have on a 16 GB v5e chip.

The axon tunnel device exposes no ``memory_stats()``, so the audit uses
XLA's own per-program accounting — ``compiled.memory_analysis()`` on
the jitted frame — which reports exact argument/output/temp/constant
allocation sizes for the optimized HLO (better than a point sample of
``bytes_in_use``: it is the number the runtime actually reserves).

Reports, per scene: argument bytes (mesh + texture + table), output
bytes (framebuffer), temp bytes (ALL transient pipeline intermediates —
bin fill layout, compacted streams, G-buffer, tier branches), and the
total vs the 16 GB chip.

Usage: nohup python tools/measure_footprint.py > /tmp/footprint.log &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.utils.device import DeviceInfo  # noqa: E402

V5E_HBM = 16 << 30


def mb(n):
    return "n/a" if n is None else f"{n / (1 << 20):9.1f} MB"


def audit(name, rp):
    compiled = jax.jit(lambda r: sr.render(r, backend="binned")
                       ).lower(rp).compile()
    m = compiled.memory_analysis()
    arg = getattr(m, "argument_size_in_bytes", None)
    out = getattr(m, "output_size_in_bytes", None)
    tmp = getattr(m, "temp_size_in_bytes", None)
    alias = getattr(m, "alias_size_in_bytes", 0) or 0
    gen = getattr(m, "generated_code_size_in_bytes", None)
    total = sum(x for x in (arg, out, tmp) if x) - alias
    print(f"{name}:")
    print(f"  arguments (mesh+texture+table) {mb(arg)}")
    print(f"  outputs (framebuffer)          {mb(out)}")
    print(f"  temps (pipeline intermediates) {mb(tmp)}")
    print(f"  code                           {mb(gen)}")
    print(f"  TOTAL                          {mb(total)} "
          f"({100 * total / V5E_HBM:.2f}% of 16 GB)", flush=True)
    return total


def main():
    info = DeviceInfo.query()
    print(f"device: {info.platform} {info.kind}", flush=True)
    audit("config2 512x512", scenes.config2_textured_cube(0.7))
    total = audit("config4 1920x1080 100k", scenes.config4_many_objects(0.3))
    print(f"headroom at config4: {(V5E_HBM - total) / (1 << 30):.2f} GB "
          f"({100 * (1 - total / V5E_HBM):.1f}% of 16 GB free)")


if __name__ == "__main__":
    main()
