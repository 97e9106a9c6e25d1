#!/usr/bin/env python
"""Generate assets/teapot.obj from the Newell patch data
(software_renderer_tpu/models/teapot.py) so BASELINE config 3 renders a
real Utah-teapot OBJ through the framework's OBJ loaders.

Usage: python tools/make_teapot_obj.py [resolution]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from software_renderer_tpu.models.teapot import teapot_mesh  # noqa: E402


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    p, t, n, uv = teapot_mesh(res)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "assets", "teapot.obj")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("# Utah teapot — tessellated from the Newell bicubic "
                "patches\n")
        f.write(f"# resolution {res} per patch edge: {len(t)} triangles, "
                f"{len(p)} vertices\n")
        for x, y, z in p:
            f.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
        for u, v in uv:
            f.write(f"vt {u:.6f} {v:.6f}\n")
        for x, y, z in n:
            f.write(f"vn {x:.6f} {y:.6f} {z:.6f}\n")
        for a, b, c in t + 1:  # OBJ is 1-based
            f.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")
    print(f"wrote {out}: {len(p)} vertices, {len(t)} triangles")


if __name__ == "__main__":
    main()
