"""Multi-chip SPMD rendering over jax.sharding meshes."""

from .tiled import TiledRenderer, render_tiled

__all__ = ["TiledRenderer", "render_tiled"]
