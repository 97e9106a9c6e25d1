"""software_renderer_tpu — a TPU-native 3D rasterization framework.

A from-scratch JAX/Pallas rebuild of the capabilities of the
``zhvrnkov/software-renderer`` reference (a Swift/Metal software renderer):
scene state in (mesh + transform + camera + light), RGBA framebuffer out,
with the whole frame jit-compiled as a single XLA computation, vmappable
over frames and scenes, and shardable over device meshes.

Pipeline: batched vertex transform (MXU matmul) -> triangle setup (exact
edge coefficients) -> tiled visibility kernel (Pallas, VMEM-staged
z-buffer) -> deferred resolve + shading (vectorized XLA). See SURVEY.md for
the reference analysis this design answers to.
"""

from .framebuffer import (
    Framebuffer,
    create_framebuffer,
    clear,
    to_rgba8,
    to_bgra8,
    encode_pixels,
    decode_pixels,
    bytes_per_pixel,
    PIXEL_FORMATS,
    CLEAR_COLOR,
    CLEAR_DEPTH,
    NO_TRIANGLE,
)
from .render import RenderPass, render, render_rows
from .models.mesh import Mesh, mesh_from_numpy, merge_meshes, transform_mesh
from .models import shapes
from .models.obj import load_obj, save_obj
from .ops import transforms
from .ops.msaa import render_msaa
from .ops.shading import Light
from .ops.texture import Texture, checkerboard
from .utils.config import RenderConfig

__version__ = "0.1.0"

__all__ = [
    "Framebuffer", "create_framebuffer", "clear", "to_rgba8", "to_bgra8",
    "encode_pixels", "decode_pixels", "bytes_per_pixel", "PIXEL_FORMATS",
    "CLEAR_COLOR", "CLEAR_DEPTH", "NO_TRIANGLE",
    "RenderPass", "render", "render_rows", "render_msaa",
    "Mesh", "mesh_from_numpy", "merge_meshes", "transform_mesh", "shapes",
    "load_obj", "save_obj",
    "transforms", "Light", "Texture", "checkerboard", "RenderConfig",
]
