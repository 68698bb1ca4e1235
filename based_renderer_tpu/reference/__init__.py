"""CPU golden-oracle rasterizer (numpy) for bit-identity testing."""

from .oracle import rasterize

__all__ = ["rasterize"]
