"""Test config: CPU-only JAX with a virtual 8-device mesh.

Must run before jax is imported anywhere (SURVEY.md §4: the reference has
no tests; our strategy is numpy-oracle golden images + property tests +
interpret-mode Pallas on CPU)."""

import os
import resource

# XLA:CPU compiles interpret-mode Pallas kernels as one huge unrolled
# function; LLVM's recursive passes overflow the default 8 MB main-thread
# stack on the largest ones (observed: SIGSEGV inside
# backend_compile_and_load on the banded fused kernel). Linux checks
# RLIMIT_STACK at fault time, so raising it here (before any compile)
# lets the main stack grow as needed.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

# Every JIT'd XLA:CPU executable mmaps several regions, and the full
# suite loads thousands of them (8 virtual devices x interpret-mode
# kernels) — measured ~65k maps at the default vm.max_map_count=65530,
# at which point the NEXT executable load SIGSEGVs (mmap failure inside
# the AOT loader). Raise the sysctl when we can (root container);
# otherwise at least say why the suite may die near map exhaustion.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _maps = int(f.read())
    if _maps < 1_000_000:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("4194304")
except (OSError, PermissionError):
    import warnings
    warnings.warn(
        "could not raise vm.max_map_count; the full suite maps ~65k+ "
        "regions and may SIGSEGV at the default 65530 limit")

os.environ["JAX_PLATFORMS"] = "cpu"  # force: never run tests over the tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The image's profile exports JAX_PLATFORMS=axon and the plugin overrides
# the env var via config, so force the platform through config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: golden tests compile many distinct
# (resolution, mesh-size) programs; cache them across runs.
# Per-platform cache subdir: axon's host-side compiles happen on the
# remote tunnel machine and their AOT entries SIGSEGV when loaded by a
# local CPU process (machine-feature mismatch) — never share the dir.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "all")
