"""Leveled logging.

The reference logs with bare ``print(Self.self, #function, ...)``
(Renderer.swift:34,248; Metal+Extensions.swift:49,403 — SURVEY.md §5 "no
log levels, no metrics"). This is the upgrade: stdlib logging with a
namespaced logger, environment-controlled level, and a counters registry
for coarse metrics.
"""

from __future__ import annotations

import collections
import logging
import os

_LOGGER = logging.getLogger("software_renderer_tpu")
if not _LOGGER.handlers:
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    _LOGGER.addHandler(handler)
    _LOGGER.setLevel(os.environ.get("SR_TPU_LOG", "WARNING").upper())
    _LOGGER.propagate = False


def get_logger(name: str | None = None) -> logging.Logger:
    return _LOGGER if name is None else _LOGGER.getChild(name)


# Coarse metrics: counters the render loop can bump (frames rendered,
# overflow triangles seen, bytes written, ...).
counters: collections.Counter = collections.Counter()


def bump(name: str, value: int = 1) -> None:
    counters[name] += value
