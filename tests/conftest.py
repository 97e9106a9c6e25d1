"""Test config: CPU-only JAX with a virtual 8-device mesh.

Must run before jax is imported anywhere (SURVEY.md §4: the reference has
no tests; our strategy is numpy-oracle golden images + property tests +
interpret-mode Pallas on CPU)."""

import os

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
