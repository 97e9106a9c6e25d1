"""Render configuration.

The reference hardcodes every knob as a compile-time constant —
framebuffer 512x512 (App.swift:52-53), window scale (App.swift:144), mesh
parameters (App.swift:124), animation rates (App.swift:169-174), the
projection (App.swift:176-181), backend choice by editing App.swift:154,
multisample count (Renderer.swift:319). SURVEY.md §5 calls for lifting
exactly these into a config object; this is it.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class RenderConfig:
    # Framebuffer (App.swift:52-53).
    width: int = 512
    height: int = 512
    # Backend: 'auto' | 'pallas' | 'binned' | 'reference' (App.swift:154).
    backend: str = "auto"
    # Shading: 'vertex' | 'flat' | 'phong' | 'textured'.
    shading: str = "vertex"
    # Supersampling factor (Renderer.swift:319's scaffold, actually working
    # via ops/msaa.py).
    msaa: int = 1
    # Backface culling (reference renders both faces).
    cull_backfaces: bool = False
    # Projection: 'reference' (w = z + 1, App.swift:176-181) or
    # 'perspective'.
    projection: str = "reference"
    fov_y: float = 1.0471975512  # 60 deg
    z_near: float = 0.1
    z_far: float = 100.0
    # Animation (App.swift:157: time += 1/60).
    time_step: float = 1.0 / 60.0
    # Scene / mesh selection.
    scene: str = "reference_sphere"
    obj_path: Optional[str] = None
    target_triangles: int = 100_000
    # Batch (config 5).
    batch: int = 1

    def projection_matrix(self):
        from ..ops import transforms as tf
        if self.projection == "reference":
            return tf.reference_projection()
        return tf.perspective(self.fov_y, self.width / self.height,
                              self.z_near, self.z_far)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RenderConfig":
        data = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    @classmethod
    def load(cls, path: str) -> "RenderConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
