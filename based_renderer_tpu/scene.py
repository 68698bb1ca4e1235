"""Scene resources: meshes, textures, uniforms (the L5 analog).

The reference's scene is a UBO of ``Uniforms { model, view, proj }`` bound
through a descriptor set (/root/reference/src/main.cpp:1462-1585) with the
geometry hard-coded in the vertex shader (cube.slang:12-61 — no vertex
buffers, main.cpp:1742-1746).  Here meshes are first-class: uploaded once
to HBM as struct-of-arrays jax arrays ("upload" = ``jax.device_put``, the
analog of the staging-buffer copy at main.cpp:2028), and uniforms are a
plain pytree passed per draw.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Mesh:
    """Device-resident triangle mesh.

    attributes: dict of (N, C) float32 per-vertex arrays; must contain
      "position" (N, 2|3|4).
    indices: (T, 3) int32 triangle list, or None for non-indexed
      (sequential triples, like the reference's vkCmdDraw path).
    """

    attributes: dict
    indices: Optional[jnp.ndarray]

    @property
    def num_vertices(self) -> int:
        return self.attributes["position"].shape[0]

    @property
    def num_triangles(self) -> int:
        if self.indices is not None:
            return self.indices.shape[0]
        return self.num_vertices // 3

    def triangle_indices(self) -> jnp.ndarray:
        """(T, 3) int32 indices, materializing the sequential case."""
        if self.indices is not None:
            return self.indices
        return jnp.arange(self.num_vertices, dtype=jnp.int32).reshape(-1, 3)


@dataclass(frozen=True)
class Texture:
    """Device-resident (H, W, C) float32 texture."""

    data: jnp.ndarray

    @property
    def shape(self):
        return self.data.shape


def upload_mesh(positions, indices=None, device=None, **attrs) -> Mesh:
    """Upload per-vertex data to the device.

    Args:
      positions: (N, 2|3|4) float array.
      indices: optional (T, 3) int triangle list.
      **attrs: additional (N, C) per-vertex attributes (color, uv, normal...).
    """
    a = {"position": jnp.asarray(np.asarray(positions), jnp.float32)}
    for k, v in attrs.items():
        v = jnp.asarray(np.asarray(v), jnp.float32)
        if v.ndim == 1:
            v = v[:, None]
        if v.shape[0] != a["position"].shape[0]:
            raise ValueError(
                f"attribute {k!r} has {v.shape[0]} rows, expected {a['position'].shape[0]}"
            )
        a[k] = v
    idx = None if indices is None else jnp.asarray(np.asarray(indices), jnp.int32)
    if device is not None:
        a = {k: jax.device_put(v, device) for k, v in a.items()}
        idx = None if idx is None else jax.device_put(idx, device)
    if idx is None and a["position"].shape[0] % 3 != 0:
        raise ValueError("non-indexed mesh needs a multiple-of-3 vertex count")
    return Mesh(attributes=a, indices=idx)


def upload_texture(image, device=None) -> Texture:
    """Upload an image as a float32 texture (uint8 input is normalized)."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    data = jnp.asarray(img, jnp.float32)
    if data.ndim == 2:
        data = data[..., None]
    if device is not None:
        data = jax.device_put(data, device)
    return Texture(data=data)
