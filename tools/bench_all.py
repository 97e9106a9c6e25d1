#!/usr/bin/env python
"""Full BASELINE.json config sweep: one bench line per config 1-5.

Runs bench.py once per config in a subprocess (each gets a clean jit
cache namespace and its own compile budget) and collects the JSON lines
into BENCH_ALL.json at the repo root — the per-config artifact VERDICT
round 1 asked for, kept separate from bench.py's single-line driver
contract.

Usage: nohup python tools/bench_all.py > /tmp/bench_all.log 2>&1 &
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CONFIGS = ["config1", "config2", "config3", "config4", "config5"]


def main():
    results = {}
    for cfg in CONFIGS:
        env = dict(os.environ, BENCH_SCENE=cfg)
        print(f"=== {cfg} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True, cwd=ROOT)
        sys.stderr.write(proc.stderr[-2000:])
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        try:
            results[cfg] = json.loads(line)
        except json.JSONDecodeError:
            results[cfg] = {"error": proc.stdout[-500:] + proc.stderr[-500:]}
        print(f"{cfg}: {line}", flush=True)
    out = os.path.join(ROOT, "BENCH_ALL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
