"""Utilities: image IO, timing/benchmark harness, config, logging."""
