"""based_renderer_tpu — a TPU-native software renderer.

A from-scratch JAX/XLA/Pallas re-creation of the capabilities of the
Vulkan + Slang reference renderer ``pJotoro/based-renderer`` (surveyed in
SURVEY.md): vertex transforms on the MXU, tile-binned Pallas rasterization,
deferred fragment shading on the VPU, and a double-buffered present path —
all fused into one jit-compiled frame function per pipeline state.

Quick start::

    import based_renderer_tpu as brt

    r = brt.Renderer(brt.RendererConfig(width=1920, height=1080))
    pipe, mesh, uniforms, _ = brt.models.demos.cube_demo(r)
    frame = r.render_frame(pipe, mesh, uniforms(0.0))
    brt.utils.image.write_png("cube.png", frame.color_np())
"""

from . import math3d, models, shader
from .pipeline import BlendState, DepthState, Pipeline, StencilState
from .renderer import FrameResult, Renderer, RendererConfig
from .scene import Mesh, Texture, generated_mesh, upload_mesh, upload_texture
from .shader import Shader, register
from .utils import errors, image
from .version import __version__

__all__ = [
    "BlendState",
    "DepthState",
    "FrameResult",
    "Mesh",
    "Pipeline",
    "Renderer",
    "RendererConfig",
    "Shader",
    "StencilState",
    "Texture",
    "errors",
    "image",
    "math3d",
    "models",
    "register",
    "shader",
    "generated_mesh",
    "upload_mesh",
    "upload_texture",
    "__version__",
]
