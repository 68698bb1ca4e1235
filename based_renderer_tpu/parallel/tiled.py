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


def _merge_vis_over_axis(vis: VisBuffer, axis: str, depth_state) -> VisBuffer:
    """Depth-composite visibility buffers across a mesh axis, reproducing
    the sequential rasterizer's winner semantics for the pipeline's depth
    state (global triangle ids are disjoint and draw-ordered across a "g"
    shard, so id comparisons ARE draw-order comparisons).

    * ordered compares with depth test+write ("less"/"greater" families):
      winner = extremal depth across shards; exact-depth ties go to the
      lowest id for strict compares (a later fragment at equal depth fails
      the strict test) and to the highest id for the *_equal compares (a
      later equal-depth fragment overwrites).
    * everything else (test or write off, "equal"/"always"/"never"): the
      per-pixel pass set is shard-independent, so the winner is simply the
      last-drawn passing fragment = max id ("order merge").
    * "not_equal" with test+write is inherently sequential (each write
      changes the next fragment's pass predicate) and cannot be composited
      from per-shard renders — render_tiled rejects it up front.
    """
    test, write, compare = depth_state.test, depth_state.write, depth_state.compare
    big = jnp.int32(2**30)
    depth_merge = test and write and compare in (
        "less",
        "less_equal",
        "greater",
        "greater_equal",
    )
    if depth_merge:
        reduce_d = jax.lax.pmin if compare.startswith("less") else jax.lax.pmax
        dbest = reduce_d(vis.depth_q, axis)
        mine = vis.depth_q == dbest
        if compare.endswith("_equal"):
            # Later draw wins exact-depth ties: max id among shards at dbest.
            tid_or_small = jnp.where(mine & (vis.tri_id >= 0), vis.tri_id, jnp.int32(-1))
            tid_win = jax.lax.pmax(tid_or_small, axis)
            won = mine & (tid_or_small == tid_win) & (tid_win >= 0)
        else:
            # Strict compare: earlier draw wins ties: min id at dbest.
            tid_or_big = jnp.where(mine & (vis.tri_id >= 0), vis.tri_id, big)
            tid_min = jax.lax.pmin(tid_or_big, axis)
            tid_win = jnp.where(tid_min < big, tid_min, jnp.int32(-1))
            won = mine & (tid_or_big == tid_min) & (tid_min < big)
        depth_q = dbest
    else:
        # Order merge: last-drawn passing fragment wins; each shard's depth
        # buffer holds the correct value for its own winner (and the clear/
        # initial value where uncovered), so propagate the winner's.
        tid_win = jax.lax.pmax(vis.tri_id, axis)
        won = (vis.tri_id == tid_win) & (tid_win >= 0)
        picked_d = jax.lax.pmax(
            jnp.where(won, vis.depth_q, jnp.int32(-(2**31))), axis
        )
        depth_q = jnp.where(tid_win >= 0, picked_d, vis.depth_q)

    def pick(x):
        got = jax.lax.pmax(jnp.where(won, x, jnp.float32(-jnp.inf)), axis)
        return jnp.where(tid_win >= 0, got, jnp.float32(0.0))

    return VisBuffer(
        tri_id=tid_win,
        depth_q=depth_q,
        b0=pick(vis.b0),
        b1=pick(vis.b1),
        b2=pick(vis.b2),
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
    if (
        geometry_axis
        and pipeline.depth.test
        and pipeline.depth.write
        and pipeline.depth.compare == "not_equal"
    ):
        raise ValueError(
            "depth compare 'not_equal' with depth write is sequential per "
            "pixel and cannot be composited across a geometry axis"
        )
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
            depth_clear=clear_depth,
            id_offset=id_off,
            origin=(x0, y0),
        )
        if geometry_axis:
            vis = _merge_vis_over_axis(vis, geometry_axis, pipeline.depth)
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
