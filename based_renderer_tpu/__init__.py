"""based_renderer_tpu — a TPU-native software renderer.

A from-scratch JAX/XLA/Pallas re-creation of the capabilities of the
Vulkan + Slang reference renderer ``pJotoro/based-renderer`` (surveyed in
SURVEY.md): vertex transforms on the MXU, tile-binned Pallas rasterization,
deferred fragment shading on the VPU, and a double-buffered present path —
all fused into one jit-compiled frame function per pipeline state.
"""

from . import math3d
from .version import __version__

__all__ = ["math3d", "__version__"]
