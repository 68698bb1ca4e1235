"""Vertex stage runner: attribute assembly, instancing, triangle gather.

The analog of vertex fetch + vertex shading, which the reference does with
no vertex buffers at all (geometry indexed by SV_VertexID in the shader,
cube.slang:12-61, empty PipelineVertexInputStateCreateInfo at
main.cpp:1742-1746).  Here the vertex transform is a real batched matmul
over mesh attribute arrays — the MXU hot path — and instancing (BASELINE
config 4) is an up-front broadcast so one draw of I instances becomes a
single (I*N)-vertex batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene import Mesh


def expand_instances(mesh: Mesh, instances: dict | None):
    """Broadcast mesh attributes and instance attributes to (I*N, C).

    instances: dict of (I, ...) arrays; trailing dims are flattened, so a
    (I, 4, 4) transform becomes an (I*N, 16) attribute the shader reshapes.
    Returns (attrs, tri_idx): merged attribute dict and (I*T, 3) indices —
    tri_idx is None for corner-sequential meshes (upload_mesh de-indexes
    at upload, so this is the normal case: the triangle gather is then a
    free reshape instead of a 3T-row device gather).
    """
    attrs = dict(mesh.attributes)
    sequential = mesh.indices is None
    tri_idx = None if sequential else mesh.triangle_indices()
    if not instances:
        return attrs, tri_idx
    num_inst = next(iter(instances.values())).shape[0]
    n = mesh.num_vertices
    out = {k: jnp.tile(v, (num_inst, 1)) for k, v in attrs.items()}
    for k, v in instances.items():
        flat = jnp.asarray(v, jnp.float32).reshape(v.shape[0], -1)
        out[k] = jnp.repeat(flat, n, axis=0, total_repeat_length=num_inst * n)
    if not sequential:
        offsets = (jnp.arange(num_inst, dtype=jnp.int32) * n)[:, None, None]
        tri_idx = (tri_idx[None, :, :] + offsets).reshape(-1, 3)
    return out, tri_idx


def apply_instance_transform(attrs: dict, position: jnp.ndarray | None = None):
    """Apply a per-vertex 'transform' attribute ((V, 16) row-major 4x4) to
    positions, returning (V, 4) transformed positions.  Shaders call this
    before their MVP multiply for instanced draws."""
    p = attrs["position"] if position is None else position
    if p.shape[-1] == 3:
        p = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), jnp.float32)], -1)
    m = attrs["transform"].reshape(-1, 4, 4)
    return jnp.einsum("vij,vj->vi", m, p)


def gather_triangles(clip: jnp.ndarray, varyings: dict, tri_idx):
    """Vertex-shader outputs -> per-triangle arrays for setup/raster.

    Returns clip_tri (T, 3, 4) and varyings_tri dict[str, (T, 3, C)].

    tri_idx None = corner-sequential mesh (the upload_mesh default): the
    "gather" is a free reshape.  Otherwise ONE fused row gather: a
    separate gather per varying costs ~10 ms per array at 1M indexed
    triangles on TPU (ops/binning.py gather discipline), while one wider
    row gather costs roughly the same as the narrowest.
    """
    if tri_idx is None:
        clip_tri = clip.reshape(-1, 3, clip.shape[-1])
        return clip_tri, {k: v.reshape(-1, 3, v.shape[-1]) for k, v in varyings.items()}
    keys = sorted(varyings)
    parts = [clip] + [varyings[k] for k in keys]
    widths = [p.shape[-1] for p in parts]
    if len(parts) == 1:
        return clip[tri_idx], {}
    fused = jnp.concatenate(parts, axis=-1)  # (V, 4 + sum C)
    g = fused[tri_idx]  # one row gather
    clip_tri = g[..., :4]
    varyings_tri = {}
    off = 4
    for k, w in zip(keys, widths[1:]):
        varyings_tri[k] = g[..., off : off + w]
        off += w
    return clip_tri, varyings_tri
