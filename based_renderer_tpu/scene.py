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
    generator: optional zero-arg traceable function producing the SAME
      attribute dict from jnp ops (see :func:`generated_mesh`) — lets
      sequence programs synthesize the mesh in-program instead of baking
      hundreds of MB of vertex constants into the executable.
    """

    attributes: dict
    indices: Optional[jnp.ndarray]
    generator: object = None

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
    """Device-resident (H, W, C) float32 texture + sampler state.

    The wrap mode and mip chain are baked at upload (the VkSampler /
    vkCmdBlitImage-mip-generation analog — the reference has neither,
    its shaders are untextured, src/cube.slang:63-67).

    ``packed`` holds, per mip level, every texel's 2x2 neighborhood as
    one row of 4*C floats, all levels concatenated — so a bilinear tap
    at any level is a SINGLE flat gather (TPUs have no gather unit;
    see ops/texture.py).  ``meta`` is static: (wrap, C, ((h, w), ...)).
    Registered as a jax pytree so textures pass through jit in uniforms
    with the static sampler state intact.
    """

    data: jnp.ndarray  # (H, W, C) float32 level 0
    packed: jnp.ndarray  # (sum_l h_l*w_l, 4*C) float32 patch rows
    meta: tuple  # (wrap: str, channels: int, sizes: ((h, w), ...), mip_filter: str)

    @property
    def shape(self):
        return self.data.shape

    @property
    def wrap(self) -> str:
        return self.meta[0]

    @property
    def mip_filter(self) -> str:
        return self.meta[3] if len(self.meta) > 3 else "nearest"

    @property
    def num_levels(self) -> int:
        return len(self.meta[2])


def _texture_flatten(t: Texture):
    return (t.data, t.packed), t.meta


def _texture_unflatten(meta, children):
    data, packed = children
    return Texture(data=data, packed=packed, meta=meta)


jax.tree_util.register_pytree_node(Texture, _texture_flatten, _texture_unflatten)


def upload_mesh(positions, indices=None, device=None, **attrs) -> Mesh:
    """Upload per-vertex data to the device.

    Indexed meshes are DE-INDEXED once here (host side): on TPU a
    per-frame 3T-row corner gather costs ~15-30 ms at 1M triangles while
    the duplicated vertex math it saves is sub-millisecond MXU work, so
    the corner-sequential layout wins every frame after the first.  The
    triangle order (and so draw-order depth ties and tri_ids) is
    unchanged.

    Args:
      positions: (N, 2|3|4) float array.
      indices: optional (T, 3) int triangle list (expanded at upload).
      **attrs: additional (N, C) per-vertex attributes (color, uv, normal...).
    """
    pos = np.asarray(positions)
    n = pos.shape[0]
    if indices is not None:
        idx = np.asarray(indices, np.int64)
        if idx.ndim != 2 or idx.shape[1] != 3:
            raise ValueError(f"indices must be (T, 3), got {idx.shape}")
        if idx.size and (idx.min() < 0 or idx.max() >= n):
            raise ValueError(
                f"index out of bounds: [{idx.min()}, {idx.max()}] vs {n} vertices"
            )
        flat = idx.reshape(-1)
        pos = pos[flat]
        attrs = {k: np.asarray(v)[flat] for k, v in attrs.items()}
    a = {"position": jnp.asarray(pos, jnp.float32)}
    for k, v in attrs.items():
        v = jnp.asarray(np.asarray(v), jnp.float32)
        if v.ndim == 1:
            v = v[:, None]
        if v.shape[0] != a["position"].shape[0]:
            raise ValueError(
                f"attribute {k!r} has {v.shape[0]} rows, expected {a['position'].shape[0]}"
            )
        a[k] = v
    if device is not None:
        a = {k: jax.device_put(v, device) for k, v in a.items()}
    if a["position"].shape[0] % 3 != 0:
        raise ValueError("non-indexed mesh needs a multiple-of-3 vertex count")
    return Mesh(attributes=a, indices=None)


def generated_mesh(generator, device=None) -> Mesh:
    """Mesh whose vertex data is DEFINED BY CODE (a traceable generator).

    ``generator()`` must return a dict of (N, C) f32 corner-sequential
    attributes (containing "position") built from jnp ops.  It runs once
    eagerly here to materialize concrete attributes for single-frame
    renders and validation; batched sequence programs
    (renderer.render_sequence_multi) instead call it INSIDE the compiled
    program, once per dispatch before the frame scan — so the mesh is
    never baked into the executable as constants (a 1M-triangle mesh
    otherwise costs ~505 MB of executable, whose remote serialization
    dominates tooling wall time; see models/geometry.py
    procedural_mesh_device).  The eager and in-program values may differ
    by compilation-dependent float rounding; programs are self-consistent
    (each uses exactly one of the two).

    Scope: the generator applies to the SINGLE-CHIP sequence path.  The
    tiled/multi-chip sequence (parallel/tiled.py) passes mesh attributes
    as runtime program ARGUMENTS — nothing is baked there in the first
    place — so it uses the eager attributes and ignores the generator.
    """
    import jax

    a = dict(jax.jit(generator)())
    if "position" not in a:
        raise ValueError(
            f"generated mesh must contain 'position'; generator returned "
            f"{sorted(a)}"
        )
    # Same normalization/validation as upload_mesh: f32, 2-D attributes,
    # consistent row counts — so generator mistakes fail HERE with a
    # clear message, not deep inside the raster pipeline.
    for k, v in a.items():
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 1:
            v = v[:, None]
        if v.shape[0] != jnp.shape(a["position"])[0]:
            raise ValueError(
                f"generated attribute {k!r} has {v.shape[0]} rows, expected "
                f"{jnp.shape(a['position'])[0]}"
            )
        a[k] = v
    if device is not None:
        a = {k: jax.device_put(v, device) for k, v in a.items()}
    if a["position"].shape[0] % 3 != 0:
        raise ValueError("generated mesh needs a multiple-of-3 vertex count")

    def normalized_generator():
        out = {}
        for k, v in dict(generator()).items():
            v = jnp.asarray(v, jnp.float32)
            out[k] = v[:, None] if v.ndim == 1 else v
        return out

    return Mesh(attributes=a, indices=None, generator=normalized_generator)


def _patch_rows(level: np.ndarray, wrap: str) -> np.ndarray:
    """Pack each texel's 2x2 neighborhood into one (4*C,) row."""
    if wrap == "repeat":
        tx1 = np.roll(level, -1, axis=1)
        ty1 = np.roll(level, -1, axis=0)
        txy = np.roll(tx1, -1, axis=0)
    else:  # clamp / mirror both clamp the +1 neighbor at the high edge
        tx1 = np.concatenate([level[:, 1:], level[:, -1:]], axis=1)
        ty1 = np.concatenate([level[1:], level[-1:]], axis=0)
        txy = np.concatenate([tx1[1:], tx1[-1:]], axis=0)
    h, w, c = level.shape
    return np.concatenate([level, tx1, ty1, txy], axis=-1).reshape(h * w, 4 * c)


def upload_texture(
    image,
    device=None,
    wrap: str = "repeat",
    mipmaps: bool = False,
    mip_filter: str = "linear",
) -> Texture:
    """Upload an image as a float32 texture (uint8 input is normalized).

    Args:
      wrap: "repeat" | "clamp" — the sampler address mode, baked into the
        packed patch layout at upload.
      mipmaps: build a full box-filtered mip chain down to 1x1.  Requires
        power-of-two dimensions (level extents and offsets are then pure
        shift arithmetic at sample time — no per-pixel table lookups,
        which are pathologically slow on TPU).
      mip_filter: "nearest" | "linear" — VK_SAMPLER_MIPMAP_MODE analog.
        Trilinear ("linear", the GPU-default quality tier) is the
        default; each full-screen tap is one flat gather (~10 ms at 2M
        pixels — the TPU gather floor) and trilinear takes two, so
        pair textured draws with Pipeline.shade_compact to pay per
        covered pixel, or opt down to the single-tap rounded-LOD
        "nearest" filter.
    """
    if mip_filter not in ("nearest", "linear"):
        raise ValueError(f"bad mip_filter {mip_filter!r}")
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, _c = img.shape
    if mipmaps and (h & (h - 1) or w & (w - 1)):
        raise ValueError(f"mipmapped textures need power-of-two dims, got {w}x{h}")

    levels = [img]
    if mipmaps:
        cur = img
        while cur.shape[0] > 1 or cur.shape[1] > 1:
            nh, nw = max(cur.shape[0] // 2, 1), max(cur.shape[1] // 2, 1)
            if cur.shape[0] > 1 and cur.shape[1] > 1:
                cur = cur.reshape(nh, 2, nw, 2, -1).mean(axis=(1, 3))
            elif cur.shape[0] > 1:
                cur = cur.reshape(nh, 2, 1, -1).mean(axis=1)
            else:
                cur = cur.reshape(1, nw, 2, -1).mean(axis=2)
            levels.append(cur.astype(np.float32))

    packed = np.concatenate([_patch_rows(lv, wrap) for lv in levels], axis=0)
    meta = (
        wrap,
        levels[0].shape[-1],
        tuple((lv.shape[0], lv.shape[1]) for lv in levels),
        mip_filter,
    )
    data = jnp.asarray(img, jnp.float32)
    packed_j = jnp.asarray(packed, jnp.float32)
    if device is not None:
        data = jax.device_put(data, device)
        packed_j = jax.device_put(packed_j, device)
    return Texture(data=data, packed=packed_j, meta=meta)
