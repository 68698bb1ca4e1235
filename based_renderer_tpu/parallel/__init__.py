"""Multi-chip SPMD rendering over jax.sharding meshes."""

from .tiled import TiledRenderer

__all__ = ["TiledRenderer"]
