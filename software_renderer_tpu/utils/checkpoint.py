"""Checkpoint/resume.

The reference has none — its only cross-frame state is ``time: Float``
(App.swift:147,157 — SURVEY.md §5). This framework has real persistent
state worth checkpointing: animation time, optimization state from the
texture-fitting training loop (parallel/sharding.py), and configs.
Plain .npz + json sidecar; no heavyweight dependencies.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, arrays: dict, meta: dict | None = None
                    ) -> None:
    """arrays: name -> array pytree leaf; meta: small json-able dict."""
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str):
    """Returns (arrays dict of np arrays, meta dict or {})."""
    data = dict(np.load(path))
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return data, meta
