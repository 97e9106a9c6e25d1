"""Frame loop: the headless counterpart of the reference's display layer.

The reference presents via MTKView at vsync — Coordinator.draw wraps the
shared buffers, invokes the frame callback, blits to the drawable and
presents (renderer/App.swift:17-109). A headless TPU renderer's
"present" is an image sink; the loop below mirrors the same structure:
advance time (App.swift:157: time += 1/60), build the frame's RenderPass,
render, sink. Device dispatch is asynchronous, so PNG encoding of frame
N-1 overlaps rendering of frame N — the pipelining the reference gets
from triple-buffered drawables.
"""

from __future__ import annotations

import dataclasses
import os
import time as _time
from typing import Callable, Optional

import jax
import numpy as np

from ..framebuffer import to_rgba8
from ..render import RenderPass, render
from .config import RenderConfig
from .log import get_logger, bump

log = get_logger("display")


class FrameLoop:
    """Drives scene_fn(time) -> RenderPass through the renderer.

    scene_fn is called once to build the scene; per-frame only the
    transform changes (via transform_fn(time)) so nothing retraces.
    """

    def __init__(self, scene_fn: Callable[[float], RenderPass],
                 transform_fn: Optional[Callable] = None,
                 config: Optional[RenderConfig] = None):
        self.config = config or RenderConfig()
        self.time = 0.0
        self._rp = scene_fn(0.0)
        self._transform_fn = transform_fn
        self._scene_fn = scene_fn

    def frame(self):
        """Render one frame and advance time (App.swift:155-157)."""
        if self._transform_fn is not None:
            rp = dataclasses.replace(self._rp,
                                     transform=self._transform_fn(self.time))
        else:
            rp = self._scene_fn(self.time)
        if self.config.msaa > 1:
            from ..ops.msaa import render_msaa
            fb = render_msaa(rp, samples=self.config.msaa,
                             backend=self.config.backend)
        else:
            fb = render(rp, backend=self.config.backend)
        self.time += self.config.time_step
        bump("frames")
        return fb

    def run(self, n_frames: int, out_dir: Optional[str] = None,
            writer=None, present=None) -> float:
        """Render n_frames; optionally sink PNGs and/or publish to a live
        present surface (utils/present.py PresentServer). Returns mean FPS.

        Each frame runs under a ``jax.profiler`` span and lands in
        ``utils.profiling.stage_times['frame']`` — wrap a call in
        ``utils.profiling.trace()`` to get a full timeline.
        """
        from .profiling import span, timed
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            if writer is None:
                from .. import runtime
                writer = runtime.write_png
        sinking = bool(out_dir) or present is not None
        pending = None  # (index, framebuffer) — encode behind the device
        t0 = _time.perf_counter()
        for i in range(n_frames):
            with span(f"frame_{i}"), timed("frame") as out:
                fb = self.frame()
                # Block on the *previous* frame's device result (or this
                # one's, when not sinking): stage_times["frame"] measures
                # honest steady-state per-frame time in both modes, while
                # PNG encoding of frame N-1 still overlaps the device
                # rendering frame N (the triple-buffered-present analogue).
                out.append(pending[1].color if pending is not None
                           else fb.color)
            if sinking:
                if pending is not None:
                    self._sink(writer, out_dir, present, *pending)
                pending = (i, fb)
        if pending is not None:
            self._sink(writer, out_dir, present, *pending)
        else:
            jax.block_until_ready(fb.color)
        dt = _time.perf_counter() - t0
        fps = n_frames / dt
        log.info("rendered %d frames in %.3fs (%.1f FPS)", n_frames, dt, fps)
        return fps

    @staticmethod
    def _sink(writer, out_dir, present, index, fb):
        if out_dir:
            img = np.asarray(to_rgba8(fb.color))
            writer(os.path.join(out_dir, f"frame_{index:05d}.png"), img)
            bump("frames_written")
        if present is not None:
            present.present(fb.color)
            bump("frames_presented")
