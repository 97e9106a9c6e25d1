#!/usr/bin/env python
"""In-pipeline-faithful microbench of build_bins' emission pieces at
config-4 sizes: the slot->src searchsorted (method='sort'), the [cap, 6]
emission-table row gather, and the main layout sort.

Fresh inputs per timed call (CLAUDE.md: scan-wrapped sort microbenches
pipeline across iterations and mislead); each call still renders NF
copies inside one jit to amortize the axon dispatch latency, but every
copy gets a distinct input derived from the call index.

Usage: nohup python tools/microbench_emission.py > /tmp/mb_emission.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.utils.timing import bench_frame, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

T = int(os.environ.get("MB_T", "100000"))
PAIRS = int(os.environ.get("MB_PAIRS", "85120"))     # 0.85*T to chunk mult
CAP = int(os.environ.get("MB_CAP", "134080"))        # pairs + fills
NF = int(os.environ.get("MB_NF", "16"))
ITERS = int(os.environ.get("MB_ITERS", "10"))

key = jax.random.PRNGKey(0)
# Monotone slot starts like sb: cumsum of small spans, plateauing at PAIRS.
spans = jax.random.randint(key, (T,), 0, 4).astype(jnp.int32)
sb0 = jnp.cumsum(spans) - spans
sb0 = jnp.minimum(sb0, PAIRS)


def run_case(name, fn):
    @jax.jit
    def run(i0):
        def body(carry, i):
            return carry + fn(i0 + i), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(NF, dtype=jnp.int32))
        return acc

    r = bench_frame(run, lambda i: (jnp.int32(i * NF),), name=name,
                    frames_per_call=NF, warmup=2, iters=ITERS)
    print(f"{name:28s}: {r.p50_ms:7.3f} ms  (compile {r.compile_s:.1f}s)",
          flush=True)
    return r.p50_ms


def fresh_sb(i):
    # Shift spans by the call index so no two frames share inputs.
    s = jnp.roll(spans, i) + (i % 3 == 0).astype(jnp.int32)
    sb = jnp.cumsum(s) - s
    return jnp.minimum(sb, PAIRS)


slots = jnp.arange(PAIRS, dtype=jnp.int32)

run_case("searchsorted method=sort", lambda i: jnp.sum(
    jnp.searchsorted(fresh_sb(i), slots, side="right",
                     method="sort").astype(jnp.float32)))

etab = jnp.arange(T * 6, dtype=jnp.int32).reshape(T, 6)


def gather_case(i):
    src = (slots * 37 + i) % T  # arbitrary indices, fresh per frame
    return jnp.sum(etab[src].astype(jnp.float32))


run_case("etab [cap,6] row gather", gather_case)


def sort_case(i):
    keys = (jnp.arange(CAP, dtype=jnp.int32) * 48271 + i) & 0x7FFFFFFF
    return jnp.sum(jnp.sort(keys).astype(jnp.float32))


run_case(f"main sort {CAP} keys", sort_case)


def ss_then_gather(i):
    src = jnp.searchsorted(fresh_sb(i), slots, side="right",
                           method="sort").astype(jnp.int32) - 1
    return jnp.sum(etab[jnp.clip(src, 0, T - 1)].astype(jnp.float32))


run_case("searchsorted + gather", ss_then_gather)
