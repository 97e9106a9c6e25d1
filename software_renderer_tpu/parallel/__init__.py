"""Parallel execution: frame batching (vmap) and multi-device sharding."""
