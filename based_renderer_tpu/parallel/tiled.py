"""Tile-parallel SPMD rendering: shard_map over a 2D device mesh.

The reference has no multi-GPU story at all (SURVEY.md §2: no NCCL/MPI,
one device); on TPU the natural scale-out axis for a renderer is
*screen-space data parallelism*: shard the framebuffer across a
``jax.sharding.Mesh`` with axes ("y", "x"), render each shard on its own
chip, and let the output sharding BE the image partition — no gather
needed unless the host reads the full frame.

Two parallel axes:
  * tile parallelism (axes "y", "x"): each device runs the FULL frame
    program (multi-draw, blending, stencil, coverage MSAA, Pallas
    rasterization — renderer._build_program with a shard context) over
    its own framebuffer window, binning triangles against its local tile
    grid in global coordinates.  Zero inter-chip communication during
    the frame.
  * geometry parallelism (axis "g", optional): each draw's triangle
    stream is sliced by the "g" index, every device rasterizes its slice
    over its window, and the per-pixel winners are depth-composited over
    ICI (a handful of pmin/pmax all-reduces per draw) — the renderer
    equivalent of data-parallel gradient reduction.  Requires the Pallas
    backend: its plane-interpolated varyings ride along the composite,
    so the merged winner is shadeable on every shard with no further
    communication.

Because every spec quantity (edge anchors, canonical depth tiles) is
computed in *global* pixel coordinates, the tiled result is bit-identical
to the single-device render — tested in tests/test_parallel.py on the
virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..renderer import Renderer, RendererConfig, FrameResult
from ..ops.raster_xla import VisBuffer


def _merge_vis_over_axis(vis: VisBuffer, extras: list, axis: str, depth_state):
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
      from per-shard renders — TiledRenderer rejects it up front.

    ``extras``: additional float planes (interp channels, invw) whose
    winning-shard values are propagated alongside the barycentrics.
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

    def pick(x, background=0.0):
        w = won
        while w.ndim < x.ndim:
            w = w[None]
        got = jax.lax.pmax(jnp.where(w, x, jnp.float32(-jnp.inf)), axis)
        keep = tid_win
        while keep.ndim < x.ndim:
            keep = keep[None]
        return jnp.where(keep >= 0, got, jnp.float32(background))

    merged = VisBuffer(
        tri_id=tid_win,
        depth_q=depth_q,
        b0=pick(vis.b0),
        b1=pick(vis.b1),
        b2=pick(vis.b2),
    )
    # invw clears to 1.0 (the rasterizer's background value — it divides).
    merged_extras = [
        None if x is None else pick(x, background=1.0 if i == 1 else 0.0)
        for i, x in enumerate(extras)
    ]
    return merged, merged_extras


class TiledRenderer:
    """Multi-chip renderer over a ("y", "x"[, "g"]) device mesh.

    The multi-device counterpart of renderer.Renderer with the same
    begin_frame/draw/end_frame surface: the full single-device frame
    program (multi-draw, blending, stencil, coverage MSAA, Pallas
    rasterization) runs per shard over its framebuffer window via
    shard_map, with triangles binned in global coordinates.
    """

    def __init__(
        self,
        config: RendererConfig,
        device_mesh: Mesh,
        geometry_axis: str | None = None,
    ):
        self.config = config
        self.mesh = device_mesh
        self.geometry_axis = geometry_axis
        ny, nx = device_mesh.shape["y"], device_mesh.shape["x"]
        if config.height % ny or config.width % nx:
            raise ValueError(
                f"framebuffer {config.width}x{config.height} not divisible "
                f"by mesh {nx}x{ny}"
            )
        self._lw, self._lh = config.width // nx, config.height // ny
        if self._lw % 8 or self._lh % 8:
            raise ValueError("shard extent must be a multiple of 8 pixels")
        # The inner Renderer provides frame recording + program building;
        # its device only selects the backend/interpret mode.
        self._inner = Renderer(config)
        self._program_cache: dict = {}

    # -- frame recording (mirrors Renderer) ---------------------------------

    def begin_frame(self, clear_color=None, clear_depth=None):
        self._inner.begin_frame(clear_color=clear_color, clear_depth=clear_depth)
        return self

    def draw(self, pipeline, mesh, uniforms=None, instances=None):
        if self.geometry_axis:
            if (
                pipeline.depth.test
                and pipeline.depth.write
                and pipeline.depth.compare == "not_equal"
            ):
                raise ValueError(
                    "depth compare 'not_equal' with depth write is sequential "
                    "per pixel and cannot be composited across a geometry axis"
                )
            if pipeline.stencil.enable:
                raise ValueError(
                    "stencil updates are sequential per pixel and cannot be "
                    "composited across a geometry axis"
                )
        self._inner.draw(pipeline, mesh, uniforms, instances)

    def end_frame(self) -> FrameResult:
        inner = self._inner
        if not inner._in_frame:
            raise RuntimeError("end_frame without begin_frame")
        inner._in_frame = False
        draws = inner._draws
        inner._draws = []
        clear_depth = inner._frame_clear[1]
        key = (inner._cache_key(draws), clear_depth, self.geometry_axis)
        program = self._program_cache.get(key)
        if program is None:
            program = self._build_sharded_program(draws, clear_depth)
            self._program_cache[key] = program
        dyn = inner._dynamic_args(draws)
        clear_color = jnp.asarray(inner._frame_clear[0], jnp.float32)
        color, depth_q, tri_id, stencil, overflowed = program(dyn, clear_color)
        if self.config.debug:
            # Same validation-layer analog as Renderer.end_frame: binner
            # overflow raises, and the (gathered) color image is NaN-checked.
            import numpy as np

            from ..utils.errors import AllocationError, FrameError

            if bool(overflowed):
                raise AllocationError(
                    "raster pair buffer overflow on a shard: a draw's "
                    "(tile, triangle) pair count exceeded its "
                    "raster_pairs_factor budget; raise "
                    "Pipeline.raster_pairs_factor"
                )
            if not np.isfinite(np.asarray(color)).all():
                raise FrameError("non-finite values in rendered color buffer")
        return FrameResult(
            color_planar=color,
            depth_q=depth_q,
            tri_id=tri_id,
            stencil=stencil,
            overflowed=overflowed,
            srgb=self.config.framebuffer_srgb,
        )

    def render(self, pipeline, scene_mesh, uniforms, instances=None):
        """Single-draw convenience (color_planar, depth_q, tri_id)."""
        self.begin_frame()
        self.draw(pipeline, scene_mesh, uniforms, instances)
        f = self.end_frame()
        return f.color_planar, f.depth_q, f.tri_id

    # -- program construction ------------------------------------------------

    def _shard_context(self):
        """The shard dict renderer._build_program consumes: traced global
        origin, static local extent, optional geometry-axis slicing."""
        mesh = self.mesh
        lw, lh = self._lw, self._lh
        g_axis = self.geometry_axis

        def origin_fn():
            return (
                jax.lax.axis_index("x") * lw,
                jax.lax.axis_index("y") * lh,
            )

        geometry = None
        if g_axis:
            ng = mesh.shape[g_axis]

            def merge_fn(vis, interp, invw, depth_state):
                vis, (interp, invw) = _merge_vis_over_axis(
                    vis, [interp, invw], g_axis, depth_state
                )
                return vis, interp, invw

            geometry = (ng, lambda: jax.lax.axis_index(g_axis), merge_fn)

        return {"origin_fn": origin_fn, "extent": (lw, lh), "geometry": geometry}

    def _replicate(self, *trees):
        from jax.sharding import NamedSharding

        repl = NamedSharding(self.mesh, P())
        return tuple(jax.device_put(t, repl) for t in trees)

    def _build_sharded_program(self, draws, clear_depth: float):
        inner = self._inner
        mesh = self.mesh
        all_axes = tuple(mesh.axis_names)
        frame = inner._build_program(
            draws, clear_depth, jit=False, shard=self._shard_context()
        )

        def shard_fn(dyn, clear_color):
            color, depth_q, tri_id, stencil, overflowed = frame(dyn, clear_color)
            # One frame-level flag: OR the per-shard binner overflows.
            overflowed = (
                jax.lax.pmax(overflowed.astype(jnp.int32), all_axes) > 0
            )
            if stencil is None:
                stencil = jnp.zeros((), jnp.int32)  # placeholder (replicated)
            return color, depth_q, tri_id, stencil, overflowed

        # Visibility buffers may carry leading sample axes (coverage MSAA);
        # only the trailing (H, W) dims are sharded.
        use_stencil = any(d.pipeline.stencil.enable for d in draws)
        vis_rank = (
            3
            if (self.config.msaa == 4 and not self.config.msaa_supersample)
            else 2
        )
        vspec = P(*([None] * (vis_rank - 2) + ["y", "x"]))
        out_specs = (
            P(None, "y", "x"),  # planar color
            vspec,
            vspec,
            vspec if use_stencil else P(),
            P(),
        )
        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=out_specs,
            check_vma=False,
        )

        def program(dyn, clear_color):
            # Inputs were uploaded committed to one device; replicate them
            # onto the mesh (geometry slicing happens per shard by index).
            dyn, clear_color = self._replicate(dyn, clear_color)
            color, depth_q, tri_id, stencil, overflowed = fn(dyn, clear_color)
            return (
                color,
                depth_q,
                tri_id,
                stencil if use_stencil else None,
                overflowed,
            )

        return program

    # -- batched frame sequences --------------------------------------------

    def render_sequence(
        self,
        pipeline,
        scene_mesh,
        uniforms_seq=None,
        instances=None,
        return_frames: bool = False,
        num_frames: int | None = None,
        static_uniforms=None,
        uniforms_fn=None,
        t0: float = 0.0,
        dt: float = 1.0 / 60.0,
    ):
        """N frames in ONE sharded dispatch (lax.scan inside shard_map) —
        the same batched animation schedule as Renderer.render_sequence,
        on the multi-chip path, including device-side ``uniforms_fn``
        uniforms (``fn(t)`` traced at ``t = t0 + dt * frame_index``).
        Returns (N,) global checksums (psum over the mesh), plus sharded
        (N, 4, H, W) planar frames when ``return_frames``."""
        return self.render_sequence_multi(
            [
                {
                    "pipeline": pipeline,
                    "mesh": scene_mesh,
                    "uniforms_seq": uniforms_seq,
                    "uniforms_fn": uniforms_fn,
                    "instances": instances,
                    "static_uniforms": static_uniforms,
                }
            ],
            num_frames=num_frames,
            return_frames=return_frames,
            t0=t0,
            dt=dt,
        )

    def render_sequence_multi(
        self,
        seq_draws,
        *,
        num_frames: int | None = None,
        return_frames: bool = False,
        t0: float = 0.0,
        dt: float = 1.0 / 60.0,
    ):
        """Multi-draw sharded ``render_sequence`` (see Renderer's).

        Each sequence draw takes either ``uniforms_seq`` (host-stacked
        (N, ...) arrays) or ``uniforms_fn`` (a traceable ``fn(t)``
        evaluated on every shard inside the scan — same schedule as the
        single-chip flagship bench).  ``t0``/``dt`` are traced scalars.
        """
        from ..utils.errors import FrameError

        inner = self._inner
        self.begin_frame()
        fns = [sd.get("uniforms_fn") for sd in seq_draws]
        for sd, fn in zip(seq_draws, fns):
            stat = sd.get("static_uniforms") or {}
            if fn is not None:
                if sd.get("uniforms_seq"):
                    raise FrameError(
                        "pass either uniforms_seq or uniforms_fn, not both"
                    )
                u0 = fn(float(t0))
            else:
                if sd.get("uniforms_seq") is None:
                    raise FrameError(
                        "each sequence draw needs uniforms_seq or uniforms_fn"
                    )
                u0 = jax.tree.map(lambda x: x[0], sd["uniforms_seq"])
            if isinstance(u0, dict):
                u0 = {**stat, **u0}
            self.draw(sd["pipeline"], sd["mesh"], u0, sd.get("instances"))
        draws = inner._draws
        inner._draws, inner._in_frame = [], False

        key = (
            "seq",
            inner._cache_key(draws),
            return_frames,
            inner._frame_clear[1],
            self.geometry_axis,
            tuple(id(fn) if fn is not None else None for fn in fns),
        )
        program = self._program_cache.get(key)
        if program is None:
            program = self._build_sharded_seq_program(
                draws, inner._frame_clear[1], return_frames, fns
            )
            self._program_cache[key] = program

        dyn = inner._dynamic_args(draws)
        n = num_frames
        for i, (sd, fn) in enumerate(zip(seq_draws, fns)):
            us = sd.get("uniforms_seq") if fn is None else None
            dyn[i]["uniforms_seq"] = jax.tree.map(inner._uniform_leaf, us or {})
            dyn[i]["static_uniforms"] = jax.tree.map(
                inner._uniform_leaf, sd.get("static_uniforms") or {}
            )
            leaves = jax.tree.leaves(us) if us is not None else []
            if leaves:
                n = leaves[0].shape[0]
        if n is None:
            raise FrameError(
                "render_sequence needs num_frames when uniforms are empty"
            )
        # Ticks both carry the frame count and index uniforms_fn draws.
        dyn[0]["frame_ticks"] = jnp.arange(n, dtype=jnp.int32)
        dyn[0]["time_base"] = jnp.asarray([t0, dt], jnp.float32)
        clear_color = jnp.asarray(inner._frame_clear[0], jnp.float32)
        outs, overflowed = program(dyn, clear_color)
        self.last_sequence_overflowed = overflowed
        if self.config.debug and bool(overflowed):
            from ..utils.errors import AllocationError

            raise AllocationError(
                "raster pair buffer overflow during render_sequence; raise "
                "Pipeline.raster_pairs_factor"
            )
        return outs

    def _build_sharded_seq_program(self, draws, clear_depth, return_frames, fns):
        inner = self._inner
        mesh = self.mesh
        all_axes = tuple(mesh.axis_names)
        frame = inner._build_program(
            draws, clear_depth, jit=False, shard=self._shard_context()
        )

        def shard_seq(dyn_seq, clear_color):
            tb = dyn_seq[0]["time_base"]

            def body(carry, xs):
                us, tick = xs
                ds = []
                for i, d0 in enumerate(dyn_seq):
                    d = dict(d0)
                    stat = d0["static_uniforms"]
                    if fns[i] is not None:
                        u = fns[i](tb[0] + tb[1] * tick.astype(jnp.float32))
                    else:
                        u = us[i]
                    d["uniforms"] = {**stat, **u} if isinstance(u, dict) else u
                    ds.append(d)
                color, _dq, _tid, _st, of = frame(ds, clear_color)
                # Global per-frame checksum: psum of the local shard sums
                # over the screen axes (the g axis holds identical merged
                # colors, so it is excluded from the sum).
                csum = jax.lax.psum(jnp.sum(color), ("y", "x"))
                out = (csum, color) if return_frames else csum
                return carry | of, out

            xs = (
                tuple(d0["uniforms_seq"] for d0 in dyn_seq),
                dyn_seq[0]["frame_ticks"],
            )
            overflowed, outs = jax.lax.scan(body, jnp.bool_(False), xs)
            overflowed = jax.lax.pmax(overflowed.astype(jnp.int32), all_axes) > 0
            return outs, overflowed

        out_specs = (
            (P(None), P(None, None, "y", "x")) if return_frames else P(None),
            P(),
        )
        fn = jax.shard_map(
            shard_seq,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=out_specs,
            check_vma=False,
        )

        def program(dyn, clear_color):
            dyn, clear_color = self._replicate(dyn, clear_color)
            return fn(dyn, clear_color)

        return program
