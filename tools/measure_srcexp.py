#!/usr/bin/env python
"""Price the compact-emission searchsorted (the slot->triangle expansion,
ops/binning.py build_bins) IN-PIPELINE: run the fused stage with the real
searchsorted vs a same-shape fake src (results wrong; only cost is read).
In-pipeline deltas are the only trustworthy sort costs on TPU
(docs/PERF.md step 13/14: scan-wrapped sort microbenches mislead).

Usage: python tools/measure_srcexp.py   (axon TPU)
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

for mode in ("base", "extra", "fake"):
    env = dict(os.environ, PROF_STAGES="fused", PROF_ITERS="8",
               SR_SRC_MODE=mode)
    out = subprocess.run(
        [sys.executable, "-c", """
import os, sys
sys.path.insert(0, %r)
from software_renderer_tpu.ops import binning
mode = os.environ["SR_SRC_MODE"]
binning._FAKE_SRC_FOR_PROFILING = mode == "fake"
binning._EXTRA_SRC_FOR_PROFILING = mode == "extra"
import runpy
runpy.run_path(%r, run_name="__main__")
""" % (os.path.join(HERE, ".."), os.path.join(HERE, "profile_stages.py"))],
        env=env, capture_output=True, text=True)
    lines = [l for l in out.stdout.splitlines() if "fused" in l]
    print(f"src={mode}: {lines[-1] if lines else out.stdout[-300:]}",
          flush=True)
    if out.returncode:
        print(out.stderr[-500:], flush=True)
print("searchsorted price = extra - base; fake = expansion chain upper "
      "bound (live population differs; see binning._FAKE_SRC comment)",
      flush=True)
