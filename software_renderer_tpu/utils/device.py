"""Device context utilities.

The reference's L0 layer is ``MTLContext.shared`` — device + queue +
library singleton with pipeline factories and submission helpers
(renderer/Metal+Extensions.swift:5-67). Under XLA the runtime owns
devices, queues, and scheduling; what remains useful at this layer:
device discovery/selection, compile-cache management, memory stats, and
donation-aware dispatch helpers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass
class DeviceInfo:
    platform: str
    kind: str
    index: int
    memory_bytes: Optional[int]

    @staticmethod
    def query(device=None) -> "DeviceInfo":
        d = device or jax.devices()[0]
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        return DeviceInfo(
            platform=d.platform,
            kind=getattr(d, "device_kind", "unknown"),
            index=d.id,
            memory_bytes=stats.get("bytes_limit"),
        )


def memory_in_use(device=None) -> Optional[int]:
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
        return stats.get("bytes_in_use")
    except Exception:
        return None


def block_on(tree):
    """Block until every leaf of a pytree is computed — the framework's
    host<->device sync primitive (the reference's ``scheduleAndWait``,
    Metal+Extensions.swift:57-67, except it should appear once per frame
    *batch*, never mid-frame)."""
    return jax.block_until_ready(tree)
