#!/usr/bin/env python
"""Name the mechanism behind the texture gather's ~4 ms count-independent
floor (VERDICT r4 item 3): capture jax.profiler traces of the production
compacted quad gather at two row counts and print every TPU op's
self-time, so the floor can be attributed to a concrete op class
(gather compute? index relayout/transpose? DMA wait? fusion barrier?)
rather than a fitted constant (tools/measure_gather_floor.py).

Usage: nohup python tools/profile_gather_floor.py > /tmp/floor_prof.log &
Writes traces under /tmp/floor_trace_{n}/ and prints per-op tables.
"""

import glob
import gzip
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N_SCAN = 16


def make_runner(quad, idx):
    @jax.jit
    def run(i0):
        def body(carry, i):
            # fresh indices per step (CLAUDE.md: scan-wrapped gather
            # microbenches constant-fold otherwise)
            return carry + jnp.sum(quad[(idx + i0 + i) & 65535]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(N_SCAN, dtype=jnp.int32))
        return acc

    return run


def parse_xplane(tracedir):
    """Sum per-op self-durations from the device planes of the trace."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older TF wheel layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"  !! no xplane.pb under {tracedir}")
        return {}
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = defaultdict(float)
    nsteps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[(plane.name, line.name, name)] += (
                    ev.duration_ps / 1e9)  # -> ms
    return per_op


def profile(n_rows, quad):
    idx = jnp.asarray(rng.integers(0, 65536, size=n_rows), jnp.int32
                      ).reshape(-1, 128)
    run = make_runner(quad, idx)
    run(jnp.int32(0)).block_until_ready()   # compile outside the trace
    tracedir = f"/tmp/floor_trace_{n_rows}"
    with jax.profiler.trace(tracedir):
        for it in range(4):
            run(jnp.int32(it * N_SCAN)).block_until_ready()
    per_op = parse_xplane(tracedir)
    print(f"\n=== {n_rows} rows x {N_SCAN} scan steps x 4 iters "
          f"(divide by {N_SCAN * 4} for per-frame) ===")
    total = defaultdict(float)
    for (plane, line, name), ms in sorted(per_op.items(),
                                          key=lambda kv: -kv[1]):
        if ms < 0.05:
            continue
        print(f"  {ms:10.3f} ms total  [{line:>12}] {name[:90]}")
        total[line] += ms
    for line, ms in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"  line total {line:>14}: {ms:9.3f} ms "
              f"({ms / (N_SCAN * 4):7.4f} ms/frame)")
    return per_op


def main():
    quad = jnp.asarray(rng.random((65536, 12)), jnp.float32)
    for n_rows in (725760, 258048):
        profile(n_rows, quad)


if __name__ == "__main__":
    main()
