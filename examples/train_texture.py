#!/usr/bin/env python
"""Appearance optimization demo: recover a texture from rendered targets.

Demonstrates the framework's training story end-to-end: differentiable
deferred shading, multi-device execution (frames x rows shard_map with a
gradient psum), and checkpoint/resume (utils/checkpoint.py).

  python examples/train_texture.py --steps 30 --out out/train
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from software_renderer_tpu.utils.timing import enable_compile_cache

enable_compile_cache()

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import software_renderer_tpu as sr  # noqa: E402
from software_renderer_tpu.models import scenes  # noqa: E402
from software_renderer_tpu.ops import transforms as tf  # noqa: E402
from software_renderer_tpu.parallel.batch import render_batch  # noqa: E402
from software_renderer_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, texture_train_step)
from software_renderer_tpu.utils.checkpoint import (  # noqa: E402
    load_checkpoint, save_checkpoint)
from software_renderer_tpu.utils.image_io import write_png  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--lr", type=float, default=150.0)
    ap.add_argument("--out", default="out/train")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    n_dev = len(jax.devices())
    n_rows = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(n_dev // n_rows, n_rows)
    print(f"device mesh: {dict(mesh.shape)}")

    rp = scenes.config2_textured_cube(0.0, width=args.size, height=args.size)
    rp = dataclasses.replace(rp, light=None)  # pure texture recovery
    times = jnp.linspace(0.0, 2.0, args.frames)
    transforms = jax.vmap(
        lambda t: rp.transform @ tf.rotation_matrix(
            tf.quat_from_axis_angle(
                tf.normalize(jnp.array([1.0, 1.0, 0.0], jnp.float32)), t))
    )(times)

    targets = render_batch(rp, transforms, backend="reference").color

    ckpt = os.path.join(args.out, "texture.npz")
    step0 = 0
    if args.resume and os.path.exists(ckpt):
        arrays, meta = load_checkpoint(ckpt)
        tex = jnp.asarray(arrays["texture"])
        step0 = int(meta.get("step", 0))
        print(f"resumed from step {step0}")
    else:
        tex = jnp.full_like(rp.texture.data, 0.5)

    for step in range(step0, step0 + args.steps):
        tex, loss = texture_train_step(tex, rp, transforms, targets, mesh,
                                       lr=args.lr, backend="reference")
        if step % 5 == 0 or step == step0 + args.steps - 1:
            print(f"step {step}: loss {float(loss):.6f}")
            save_checkpoint(ckpt, {"texture": np.asarray(tex)},
                            meta={"step": step + 1})

    write_png(os.path.join(args.out, "recovered.png"),
              np.asarray(sr.to_rgba8(jnp.concatenate(
                  [tex, jnp.ones_like(tex[..., :1])], axis=-1))))
    write_png(os.path.join(args.out, "target_texture.png"),
              np.asarray(sr.to_rgba8(jnp.concatenate(
                  [rp.texture.data, jnp.ones_like(rp.texture.data[..., :1])],
                  axis=-1))))
    print(f"wrote {args.out}/recovered.png")


if __name__ == "__main__":
    main()
