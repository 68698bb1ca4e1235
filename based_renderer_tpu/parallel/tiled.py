"""Tile-parallel SPMD rendering: shard_map over a 2D device mesh.

The reference has no multi-GPU story at all (SURVEY.md §2: no NCCL/MPI,
one device); on TPU the natural scale-out axis for a renderer is
*screen-space data parallelism*: shard the framebuffer across a
``jax.sharding.Mesh`` with axes ("y", "x"), render each tile on its own
chip against replicated (or geometry-sharded) triangle data, and let the
output sharding BE the image partition — no gather needed unless the host
reads the full frame.

Two parallel axes are implemented:
  * tile parallelism (axes "y", "x"): each device rasterizes the full
    triangle set into its own framebuffer tile.  Zero inter-chip
    communication during the frame; collectives appear only if the caller
    resharsds/reads the image.
  * geometry parallelism (axis "g", optional): triangles are sharded
    across "g"; each device rasterizes its shard over its tile, and the
    per-pixel winners are merged with a packed depth|id minimum over ICI
    (one all-reduce) — a depth-compositing collective, the renderer
    equivalent of data-parallel gradient reduction.

Because every spec quantity (edge anchors, canonical depth tiles) is
computed in *global* pixel coordinates, the tiled result is bit-identical
to the single-device render — tested in tests/test_parallel.py on the
virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import shader as shader_lib
from ..ops import fixedpoint as fp
from ..ops import raster_xla
from ..ops.raster_xla import VisBuffer
from ..ops.setup import setup_triangles
from ..ops.vertex import expand_instances, gather_triangles
from ..scene import Mesh as SceneMesh


def _merge_vis_over_axis(vis: VisBuffer, axis: str) -> VisBuffer:
    """Depth-composite visibility buffers across a mesh axis.

    Winner = minimum (depth_q, shard, tri_id) lexicographic key, packed
    into one int64-free scheme: depth_q fits 31 bits; break ties by shard
    index then tri_id to keep draw-order determinism of the monolithic
    render (lower global triangle id wins on exact depth ties).
    """
    # Min depth across shards.
    dmin = jax.lax.pmin(vis.depth_q, axis)
    mine = vis.depth_q == dmin
    big = jnp.int32(2**30)
    # Among shards at dmin, pick the one with the smallest winning tri_id
    # (global ids are disjoint and ordered across a "g" triangle shard).
    tid_or_big = jnp.where(mine & (vis.tri_id >= 0), vis.tri_id, big)
    tid_win = jax.lax.pmin(tid_or_big, axis)
    won = mine & (tid_or_big == tid_win) & (tid_win < big)

    def pick(x, neutral):
        return jax.lax.pmax(jnp.where(won, x, neutral), axis)

    return VisBuffer(
        tri_id=jnp.where(tid_win < big, tid_win, jnp.int32(-1)),
        depth_q=dmin,
        b0=pick(vis.b0, jnp.float32(-jnp.inf)),
        b1=pick(vis.b1, jnp.float32(-jnp.inf)),
        b2=pick(vis.b2, jnp.float32(-jnp.inf)),
    )


def render_tiled(
    mesh: Mesh,
    clip_tri: jnp.ndarray,
    varyings: dict,
    fragment_fn,
    uniforms,
    width: int,
    height: int,
    pipeline,
    clear_color,
    clear_depth: float = 1.0,
    geometry_axis: str | None = None,
):
    """Render one draw over a device mesh with axes ("y", "x"[, "g"]).

    clip_tri/varyings are replicated (or sharded over "g" when
    geometry_axis is given).  Returns the full (H, W, 4) image, sharded
    over ("y", "x").
    """
    axes = mesh.axis_names
    ny = mesh.shape["y"]
    nx = mesh.shape["x"]
    if height % ny or width % nx:
        raise ValueError(f"framebuffer {width}x{height} not divisible by mesh {nx}x{ny}")
    tile_h, tile_w = height // ny, width // nx
    ng = mesh.shape[geometry_axis] if geometry_axis else 1
    num_tris = clip_tri.shape[0]

    tri_spec = P(geometry_axis) if geometry_axis else P()
    var_spec = jax.tree.map(lambda _: tri_spec, varyings)
    in_specs = (tri_spec, var_spec, jax.tree.map(lambda _: P(), uniforms))
    # Color ships planar (4, H, W): device (H, W, 4) buffers lane-pad 32x.
    out_specs = (P(None, "y", "x"), P("y", "x"), P("y", "x"))

    def shard_fn(clip_shard, var_shard, unif):
        iy = jax.lax.axis_index("y")
        ix = jax.lax.axis_index("x")
        y0 = iy * tile_h
        x0 = ix * tile_w
        ts = setup_triangles(
            clip_shard,
            width,
            height,
            cull_mode=pipeline.cull_mode,
            front_face=pipeline.front_face,
        )
        id_off = (jax.lax.axis_index(geometry_axis) * (num_tris // ng)) if geometry_axis else 0
        vis = raster_xla.rasterize_vis(
            ts,
            tile_w,
            tile_h,
            depth_test=pipeline.depth.test,
            depth_compare=pipeline.depth.compare,
            depth_write=pipeline.depth.write,
            depth_clip=pipeline.depth.clip,
            id_offset=id_off,
            origin=(x0, y0),
        )
        if geometry_axis:
            vis = _merge_vis_over_axis(vis, geometry_axis)
            # After the merge every "g" shard holds the global winner; the
            # winning shard's barycentrics were propagated, but varyings
            # live on the owner shard — gather them by re-localizing ids.
            local = vis.tri_id - id_off
            own = (local >= 0) & (local < clip_shard.shape[0])
            vis_local = vis._replace(tri_id=jnp.where(own, local, -1))
            rgba = raster_xla.shade_deferred(
                vis_local,
                ts,
                var_shard,
                fragment_fn,
                unif,
                background=jnp.zeros((tile_h, tile_w, 4), jnp.float32),
                perspective=pipeline.perspective_correct,
            )
            rgba = jnp.where(own[..., None], rgba, 0.0)
            rgba = jax.lax.psum(rgba, geometry_axis)
            bg = jnp.broadcast_to(jnp.asarray(clear_color, jnp.float32), rgba.shape)
            color = jnp.where((vis.tri_id >= 0)[..., None], rgba, bg)
            return jnp.transpose(color, (2, 0, 1)), vis.depth_q, vis.tri_id
        else:
            color = raster_xla.shade_deferred(
                vis,
                ts,
                var_shard,
                fragment_fn,
                unif,
                background=jnp.broadcast_to(
                    jnp.asarray(clear_color, jnp.float32), (tile_h, tile_w, 4)
                ),
                perspective=pipeline.perspective_correct,
            )
        return jnp.transpose(color, (2, 0, 1)), vis.depth_q, vis.tri_id

    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    # Lay the inputs out on the mesh (replicated, or sharded over "g").
    clip_tri = jax.device_put(clip_tri, NamedSharding(mesh, tri_spec))
    varyings = jax.device_put(varyings, NamedSharding(mesh, P()) if not geometry_axis else NamedSharding(mesh, tri_spec))
    uniforms = jax.device_put(uniforms, NamedSharding(mesh, P()))
    return fn(clip_tri, varyings, uniforms)


class TiledRenderer:
    """Multi-chip single-draw renderer over a 2D(+geometry) device mesh.

    The multi-device counterpart of renderer.Renderer for the flagship
    demos: one pipeline, one mesh, uniforms per frame.
    """

    def __init__(self, config, device_mesh: Mesh, geometry_axis: str | None = None):
        self.config = config
        self.mesh = device_mesh
        self.geometry_axis = geometry_axis
        self._jit_cache = {}

    def render(self, pipeline, scene_mesh: SceneMesh, uniforms, instances=None):
        shd = shader_lib.get(pipeline.shader)
        attrs, tri_idx = expand_instances(scene_mesh, instances)
        clip, vary = shd.vertex(attrs, uniforms)
        clip_tri, var_tri = gather_triangles(clip, vary, tri_idx)
        if pipeline.near_clip:
            from ..ops.clip import clip_near

            clip_tri, var_tri = clip_near(clip_tri, var_tri)
        if self.geometry_axis:
            ng = self.mesh.shape[self.geometry_axis]
            t = clip_tri.shape[0]
            pad = (-t) % ng
            if pad:
                clip_tri = jnp.pad(clip_tri, ((0, pad), (0, 0), (0, 0)))
                var_tri = {k: jnp.pad(v, ((0, pad), (0, 0), (0, 0))) for k, v in var_tri.items()}
        return render_tiled(
            self.mesh,
            clip_tri,
            var_tri,
            shd.fragment,
            uniforms,
            self.config.width,
            self.config.height,
            pipeline,
            self.config.clear_color,
            self.config.clear_depth,
            geometry_axis=self.geometry_axis,
        )
