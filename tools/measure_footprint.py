#!/usr/bin/env python
"""HBM footprint audit at the production configuration (VERDICT r4
item 8): how much device memory the north-star frame actually holds at
budget 0.85 + the texture tier chain + the precomputed quad table, and
what the peak is during a frame. Bounds how far the pair budget and
tier caps can grow on a 16 GB v5e chip.

Reports, for config4 (1920x1080, ~100k tris) and config2:
  * steady-state bytes_in_use with the scene resident (mesh + texture +
    quad table + framebuffer) — the persistent footprint;
  * peak_bytes_in_use across a rendered frame — the transient pipeline
    footprint (bin fill layout, compacted streams, G-buffer, tier
    intermediates);
  * the device's bytes_limit for headroom context.

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
from software_renderer_tpu.utils.device import DeviceInfo, memory_in_use  # noqa: E402


def mb(n):
    return "n/a" if n is None else f"{n / (1 << 20):8.1f} MB"


def peak_in_use(device):
    stats = device.memory_stats() or {}
    return stats.get("peak_bytes_in_use")


def audit(name, rp):
    d = jax.devices()[0]
    base = memory_in_use(d)
    # Move the scene to the device (mesh, texture + table leaves).
    rp_dev = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, d) if hasattr(x, "shape") else x, rp)
    jax.block_until_ready([l for l in jax.tree_util.tree_leaves(rp_dev)
                           if hasattr(l, "shape")])
    scene_resident = memory_in_use(d)
    fb = jax.block_until_ready(sr.render(rp_dev, backend="binned"))
    after_frame = memory_in_use(d)
    peak = peak_in_use(d)
    print(f"{name}:")
    print(f"  before scene        {mb(base)}")
    print(f"  scene resident      {mb(scene_resident)} "
          f"(+{mb((scene_resident or 0) - (base or 0))})")
    print(f"  after frame (fb)    {mb(after_frame)}")
    print(f"  peak during frame   {mb(peak)}")
    del fb
    return peak


def main():
    d = jax.devices()[0]
    info = DeviceInfo.query(d)
    print(f"device: {info.platform} {info.kind}  "
          f"limit {mb(info.memory_bytes)}", flush=True)
    audit("config2 512x512", scenes.config2_textured_cube(0.7))
    peak = audit("config4 1920x1080 100k", scenes.config4_many_objects(0.3))
    if info.memory_bytes and peak:
        print(f"headroom at config4 peak: "
              f"{(info.memory_bytes - peak) / (1 << 20):.0f} MB "
              f"({100 * (1 - peak / info.memory_bytes):.1f}% of "
              f"{info.memory_bytes / (1 << 30):.1f} GB free)")


if __name__ == "__main__":
    main()
