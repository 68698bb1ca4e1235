"""Renderer: record draws -> one jit-compiled frame program (the L3/L6 core).

This replaces the reference's whole command-buffer machinery: where the
reference records barriers + beginRendering + bind + draw + present-layout
transitions into a ``vk::CommandBuffer`` every frame
(/root/reference/src/main.cpp:1920-2139), here ``begin_frame``/``draw``/
``end_frame`` record a draw list that is traced *once* per distinct
(pipeline state, mesh/uniform shapes) signature into a single fused XLA
program, cached like the reference's ``vk::PipelineCache``
(main.cpp:1626-1633), and replayed with zero re-tracing thereafter.

Frame program structure (all inside one jit):
  clear -> per draw: vertex stage (MXU matmul) -> triangle setup ->
  rasterize into a shared visibility buffer -> per draw: deferred fragment
  shading + blend composite -> (optional MSAA resolve) -> color image.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import shader as shader_lib
from .ops import raster_xla
from .ops.raster_xla import VisBuffer
from .ops.setup import setup_triangles
from .ops.vertex import expand_instances, gather_triangles
from .ops import fixedpoint as fp
from .pipeline import Pipeline
from .scene import Mesh, Texture, upload_mesh, upload_texture
from .utils.errors import AllocationError, DrawError, FrameError


@dataclass(frozen=True)
class RendererConfig:
    """Static renderer configuration (the analog of the compile-time
    BASED_RENDERER_* flag family, main.cpp:3-29, plus swapchain extent)."""

    width: int = 800
    height: int = 600
    # 1 or 4.  msaa=4 runs coverage-sample MSAA on EVERY backend
    # (per-sample visibility at the Vulkan standard sample positions,
    # attributes at the pixel center — the analog of the multisample
    # state the reference configures, main.cpp:1790): in-kernel on
    # Pallas, per-sample edge stepping on XLA — bit-identical images
    # across backends.  Set msaa_supersample for 2x2 ordered-grid
    # supersampling instead (a quality tier MSAA cannot express:
    # per-sample SHADING).
    msaa: int = 1
    msaa_supersample: bool = False
    clear_color: tuple = (0.0, 0.0, 0.0, 1.0)  # main.cpp clears to black
    clear_depth: float = 1.0
    debug: bool = False  # NaN/shape validation (the validation-layer analog)
    raster_backend: str = "auto"  # "auto" | "xla" | "pallas"
    clear_stencil: int = 0  # stencil attachment clear value (0..255)
    # Present/encode through the sRGB transfer function (IEC 61966-2-1;
    # alpha stays linear).  The reference takes the FIRST reported surface
    # format for its swapchain (/root/reference/src/main.cpp:1338-1339,
    # TODO noted) — on real hardware almost always *_SRGB, so its
    # presented bytes are sRGB-encoded.  Shading stays linear either way;
    # the transfer function applies only at color_u8/present time, exactly
    # like a hardware sRGB render-target store.
    framebuffer_srgb: bool = False

    def __post_init__(self):
        if self.msaa not in (1, 4):
            raise ValueError("msaa must be 1 or 4")
        if self.width <= 0 or self.height <= 0 or self.width > 8192 or self.height > 8192:
            raise ValueError("extent must be within 1..8192")


@dataclass
class _DrawCmd:
    pipeline: Pipeline
    mesh: Mesh
    uniforms: Any
    instances: Optional[dict]


@dataclass
class FrameResult:
    """Rendered frame (device arrays; fetch lazily).

    The device-side color is channel-planar (4, H, W) — XLA pads minor
    dims to 128 lanes, so (H, W, 4) on device would cost 32x its size
    (see _blend).  Interleaved views are produced host-side for free.
    """

    color_planar: jnp.ndarray  # (4, H, W) f32, device layout
    # Visibility buffers.  msaa=1: (H, W).  msaa=4: (4, H, W) per-sample
    # layers (coverage-sample MSAA) on BOTH backends — since round 3 the
    # XLA backend uses the same coverage-MSAA layout as Pallas
    # (raster_xla.rasterize_vis(msaa4=True)); bit-exact cross-backend
    # (tests/test_msaa.py).
    depth_q: jnp.ndarray  # int32 quantized depth
    tri_id: jnp.ndarray  # int32
    # Stencil plane (same layout as depth_q), present only when a draw in
    # the frame had stencil enabled; else None.
    stencil: Any = None
    # True when any draw's binned (tile, triangle) pair count exceeded its
    # raster_pairs_factor budget — trailing triangles were dropped.  Always
    # False on the XLA backend (no pair budget).  In RendererConfig.debug
    # mode the overflow raises AllocationError in end_frame instead.
    overflowed: Any = False
    # RendererConfig.framebuffer_srgb snapshot: color_u8() encodes with the
    # sRGB transfer function (alpha linear) when set.
    srgb: bool = False

    @property
    def color(self) -> jnp.ndarray:
        """(H, W, 4) view (device op; prefer color_np for host use)."""
        return jnp.transpose(self.color_planar, (1, 2, 0))

    def color_np(self) -> np.ndarray:
        return np.moveaxis(np.asarray(self.color_planar), 0, -1)

    def color_u8(self) -> np.ndarray:
        from .utils import image

        return image.to_u8(self.color_np(), srgb=self.srgb)

    def depth_np(self) -> np.ndarray:
        return np.asarray(self.depth_q, np.int64).astype(np.float64) / fp.DEPTH_ONE_Q


def _blend(src, dst, state):
    """Blend in planar (4, H, W) layout (alpha = channel 3, leading axis).

    Implements the full VkPipelineColorBlendAttachmentState semantics the
    reference declares (/root/reference/src/main.cpp:1806-1827): separate
    color/alpha factor pairs and ops, the constant-color factor family,
    min/max ops ignoring factors, and a colorWriteMask that applies even
    when blending is disabled.

    Framebuffers are kept channel-planar on device: XLA pads the minor
    dimension to 128 lanes, so a materialized (H, W, 4) image costs 32x
    its logical size in HBM and bandwidth (measured: a supersampled-4K
    (H, W, 4) color buffer alone blew out HBM with a 32.0x padding
    expansion).  Host-side layout conversion is free by comparison.
    """
    extra = (1,) * (src.ndim - 1)
    const = jnp.asarray(state.constants, jnp.float32).reshape((4,) + extra)

    def factor(name, alpha):
        # Channel-resolved factor: the RGB rows see the color component of
        # color-valued factors; the alpha row sees the alpha component.
        def comp(x):
            return x[3:4] if alpha else x[0:3]

        if name == "zero":
            return jnp.float32(0.0)
        if name == "one":
            return jnp.float32(1.0)
        if name == "src_color":
            return comp(src)
        if name == "one_minus_src_color":
            return 1.0 - comp(src)
        if name == "dst_color":
            return comp(dst)
        if name == "one_minus_dst_color":
            return 1.0 - comp(dst)
        if name == "src_alpha":
            return src[3:4]
        if name == "one_minus_src_alpha":
            return 1.0 - src[3:4]
        if name == "dst_alpha":
            return dst[3:4]
        if name == "one_minus_dst_alpha":
            return 1.0 - dst[3:4]
        if name == "constant_color":
            return comp(const)
        if name == "one_minus_constant_color":
            return 1.0 - comp(const)
        if name == "constant_alpha":
            return const[3:4]
        if name == "one_minus_constant_alpha":
            return 1.0 - const[3:4]
        if name == "src_alpha_saturate":
            # f = min(src.a, 1 - dst.a) for color, 1 for alpha.
            if alpha:
                return jnp.float32(1.0)
            return jnp.minimum(src[3:4], 1.0 - dst[3:4])
        raise ValueError(name)

    def combine(op, sf_name, df_name, alpha):
        s = src[3:4] if alpha else src[0:3]
        d = dst[3:4] if alpha else dst[0:3]
        if op == "min":
            return jnp.minimum(s, d)
        if op == "max":
            return jnp.maximum(s, d)
        a = s * factor(sf_name, alpha)
        b = d * factor(df_name, alpha)
        if op == "add":
            return a + b
        if op == "subtract":
            return a - b
        if op == "reverse_subtract":
            return b - a
        raise ValueError(op)

    if state.enable:
        rgb = combine(state.color_op, state.src_factor, state.dst_factor, alpha=False)
        a = combine(
            state.alpha_op if state.alpha_op is not None else state.color_op,
            state.src_alpha_factor
            if state.src_alpha_factor is not None
            else state.src_factor,
            state.dst_alpha_factor
            if state.dst_alpha_factor is not None
            else state.dst_factor,
            alpha=True,
        )
        out = jnp.concatenate([rgb, a], axis=0)
    else:
        out = src
    if set(state.write_mask) != set("rgba"):
        mask = jnp.asarray(
            [ch in state.write_mask for ch in "rgba"], jnp.bool_
        ).reshape((4,) + extra)
        out = jnp.where(mask, out, dst)
    return out


class Renderer:
    """Single-device renderer; see parallel/ for the multi-chip tiled path."""

    def __init__(self, config: RendererConfig = RendererConfig(), device=None):
        self.config = config
        self.device = device if device is not None else jax.devices()[0]
        self._draws: list[_DrawCmd] = []
        self._in_frame = False
        self._frame_clear = (config.clear_color, config.clear_depth)
        self._program_cache: dict = {}
        self.frame_count = 0

    # -- resources ---------------------------------------------------------

    def upload_mesh(self, positions, indices=None, **attrs) -> Mesh:
        return upload_mesh(positions, indices=indices, device=self.device, **attrs)

    def generated_mesh(self, generator) -> Mesh:
        """Mesh defined by a traceable generator (scene.generated_mesh):
        sequence programs synthesize it in-program instead of capturing
        ~MBs of vertex constants into the executable."""
        from .scene import generated_mesh

        return generated_mesh(generator, device=self.device)

    def upload_texture(
        self,
        image,
        wrap: str = "repeat",
        mipmaps: bool = False,
        mip_filter: str = "linear",
    ) -> Texture:
        return upload_texture(
            image,
            device=self.device,
            wrap=wrap,
            mipmaps=mipmaps,
            mip_filter=mip_filter,
        )

    def resize(self, width: int, height: int):
        """Change the framebuffer extent (the swapchain-recreation analog:
        the reference catches vk::OutOfDateKHRError and would rebuild,
        main.cpp:713-716).  Programs are cached per extent, so switching
        back to a previous size is free."""
        if self._in_frame:
            raise FrameError("resize during an open frame")
        self.config = dataclasses.replace(self.config, width=width, height=height)

    # -- frame recording ---------------------------------------------------

    def begin_frame(self, clear_color=None, clear_depth=None):
        if self._in_frame:
            raise FrameError("begin_frame called twice without end_frame")
        self._in_frame = True
        self._draws = []
        self._frame_clear = (
            tuple(clear_color) if clear_color is not None else self.config.clear_color,
            float(clear_depth) if clear_depth is not None else self.config.clear_depth,
        )
        return self

    def draw(self, pipeline: Pipeline, mesh: Mesh, uniforms=None, instances=None):
        if not self._in_frame:
            raise FrameError("draw outside begin_frame/end_frame")
        shd = shader_lib.get(pipeline.shader)  # validates the shader name
        for need in shd.attributes:
            if need not in mesh.attributes and not (instances and need in instances) and not (
                instances and f"instance_{need}" in instances
            ):
                raise DrawError(
                    f"shader {pipeline.shader!r} needs attribute {need!r}; "
                    f"mesh has {sorted(mesh.attributes)}"
                )
        if self.config.debug:
            self._validate_draw(pipeline, mesh, instances)
        self._draws.append(_DrawCmd(pipeline, mesh, uniforms or {}, instances))

    def _validate_draw(self, pipeline: Pipeline, mesh: Mesh, instances):
        """Draw-time validation (debug only — the validation-layer analog,
        main.cpp:830-852).  Checks shapes/dtypes and index bounds; index
        checking syncs the device, which is exactly what validation layers
        cost on the reference too."""
        n = mesh.num_vertices
        for k, v in mesh.attributes.items():
            if v.ndim != 2:
                raise DrawError(f"attribute {k!r} must be (N, C), got {v.shape}")
            if v.shape[0] != n:
                raise DrawError(
                    f"attribute {k!r} has {v.shape[0]} rows; position has {n}"
                )
        p = mesh.attributes["position"]
        if p.shape[1] not in (2, 3, 4):
            raise DrawError(f"position must be (N, 2|3|4), got {p.shape}")
        if mesh.indices is not None:
            idx = np.asarray(mesh.indices)
            if idx.ndim != 2 or idx.shape[1] != 3:
                raise DrawError(f"indices must be (T, 3), got {idx.shape}")
            if idx.size and (idx.min() < 0 or idx.max() >= n):
                raise DrawError(
                    f"index out of bounds: [{idx.min()}, {idx.max()}] vs {n} vertices"
                )
        if instances:
            counts = {k: np.shape(v)[0] for k, v in instances.items()}
            if len(set(counts.values())) > 1:
                raise DrawError(f"instance attribute counts differ: {counts}")

    def end_frame(self) -> FrameResult:
        if not self._in_frame:
            raise FrameError("end_frame without begin_frame")
        self._in_frame = False
        draws = self._draws
        self._draws = []
        key = self._cache_key(draws) + (self._frame_clear[1],)
        program = self._program_cache.get(key)
        if program is None:
            program = self._build_program(draws, self._frame_clear[1])
            self._program_cache[key] = program
        dyn = self._dynamic_args(draws)
        clear_color = jnp.asarray(self._frame_clear[0], jnp.float32)
        color, depth_q, tri_id, stencil, overflowed = program(dyn, clear_color)
        if self.config.debug:
            if bool(overflowed):
                raise AllocationError(
                    "raster pair buffer overflow: a draw's (tile, triangle) "
                    "pair count exceeded its raster_pairs_factor budget, so "
                    "trailing triangles were dropped; raise "
                    "Pipeline.raster_pairs_factor"
                )
            cnp = np.asarray(color)
            if not np.isfinite(cnp).all():
                raise FrameError("non-finite values in rendered color buffer")
        self.frame_count += 1
        return FrameResult(
            color_planar=color,
            depth_q=depth_q,
            tri_id=tri_id,
            stencil=stencil,
            overflowed=overflowed,
            srgb=self.config.framebuffer_srgb,
        )

    def render_frame(self, pipeline, mesh, uniforms=None, instances=None, **clear) -> FrameResult:
        """Convenience: one-draw frame."""
        self.begin_frame(**clear)
        self.draw(pipeline, mesh, uniforms, instances)
        return self.end_frame()

    # -- program construction ----------------------------------------------

    def _cache_key(self, draws):
        def sig(x):
            if isinstance(x, Texture):
                x = x.data
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return (tuple(x.shape), str(x.dtype))
            return repr(x)

        parts = [self.config.width, self.config.height, self.config.msaa]
        for d in draws:
            u_leaves, u_tree = jax.tree.flatten(d.uniforms)
            parts.append(
                (
                    d.pipeline,
                    tuple(sorted((k, sig(v)) for k, v in d.mesh.attributes.items())),
                    None if d.mesh.indices is None else sig(d.mesh.indices),
                    None
                    if not d.instances
                    else tuple(sorted((k, sig(v)) for k, v in d.instances.items())),
                    str(u_tree),
                    tuple(sig(l) for l in u_leaves),
                )
            )
        return tuple(parts)

    @staticmethod
    def _uniform_leaf(x):
        if isinstance(x, Texture):
            return x.data
        a = jnp.asarray(x)
        if jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(jnp.float32)
        return a

    def _dynamic_args(self, draws):
        out = []
        for d in draws:
            out.append(
                {
                    "attrs": d.mesh.attributes,
                    "indices": d.mesh.indices,
                    "instances": d.instances or {},
                    "uniforms": jax.tree.map(self._uniform_leaf, d.uniforms),
                }
            )
        return out

    def _signal_fallback(self, pipe, knob, why):
        """A requested fast kernel variant is ineligible for this draw:
        warn (or raise in debug mode) instead of silently rendering ~6x
        slower on the sequential kernel."""
        import warnings

        msg = (
            f"{knob} requested (shader {pipe.shader!r}) but the draw is "
            f"ineligible: {why}; falling back to the sequential raster "
            f"kernel"
        )
        if self.config.debug:
            raise DrawError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=4)

    @staticmethod
    def _scaled_scissor(pipe, scale):
        if pipe.scissor is None:
            return None
        return tuple(int(v) * scale for v in pipe.scissor)

    def _use_pallas(self) -> bool:
        backend = self.config.raster_backend
        if backend == "pallas":
            return True
        if backend == "xla":
            return False
        return self.device.platform not in ("cpu",)  # "auto"

    def _build_program(self, draws, clear_depth: float = 1.0, jit: bool = True, shard=None):
        """Build the frame program.

        ``shard`` (parallel/tiled.py) runs this same frame builder inside a
        shard_map: a dict with
          origin_fn: () -> (ox, oy) traced global pixel offset of the shard
          extent:    (lw, lh) static local framebuffer extent
          geometry:  (ng, merge_fn) or None — slice each draw's triangle
                     stream into ng chunks by the geometry-axis index and
                     depth-composite the per-shard visibility with merge_fn
        The vertex stage and triangle setup always use GLOBAL viewport
        coordinates, so the sharded render is bit-identical to the
        monolithic one.
        """
        cfg = self.config
        clear_depth_q = jnp.int32(round(clear_depth * fp.DEPTH_ONE_Q))
        use_pallas = self._use_pallas()
        # MSAA-4x: true coverage-sample multisampling on both backends
        # (per-sample visibility at the standard sample positions,
        # attributes/shading once per pixel — ops/raster_pallas.py
        # _raster_kernel_msaa4 / raster_xla.rasterize_vis msaa4=True,
        # bit-identical to each other and the oracle); opt-in 2x2
        # ordered-grid supersampling with a box resolve instead.
        coverage_msaa = cfg.msaa == 4 and not cfg.msaa_supersample
        scale = 2 if (cfg.msaa == 4 and cfg.msaa_supersample) else 1
        nsamp = 4 if coverage_msaa else 1
        rw, rh = cfg.width * scale, cfg.height * scale
        if shard is not None:
            lw, lh = shard["extent"]
            erw, erh = lw * scale, lh * scale
        else:
            erw, erh = rw, rh
        pipelines = [d.pipeline for d in draws]
        shaders = [shader_lib.get(p.shader) for p in pipelines]

        # Static per-draw kernel-variant eligibility (everything it depends
        # on is a static jit key).  A requested-but-ineligible fast variant
        # silently costing ~6x used to be invisible; now it warns, and
        # raises in debug mode (the validation-layer analog).
        def _reduction_ineligible_reason(pipe, tile_w_eff, need_tile128):
            if not (pipe.depth.test and pipe.depth.write):
                return "depth test+write disabled"
            if pipe.depth.compare not in (
                "less",
                "less_equal",
                "greater",
                "greater_equal",
            ):
                return f"unordered depth compare {pipe.depth.compare!r}"
            if pipe.stencil.enable:
                return "stencil enabled"
            if coverage_msaa and not need_tile128:
                # The sublane kernel (need_tile128) has a coverage-MSAA
                # variant (_raster_kernel_msaa4_sublane); batch does not.
                return "coverage-sample MSAA"
            if pipe.raster_two_pass:
                return "two-pass rasterization requested"
            if need_tile128 and tile_w_eff != 128:
                return f"tile_w {tile_w_eff} != 128"
            return None

        tile_eff = []
        variant_ok = []  # (batch_eligible, sublane_eligible) per draw
        for pipe in pipelines:
            tile_w_eff, tile_h_eff = pipe.raster_tile
            if shard is not None:
                import math

                tile_w_eff = math.gcd(tile_w_eff, erw)
                tile_h_eff = math.gcd(tile_h_eff, erh)
                if tile_w_eff < 8 or tile_h_eff < 8:
                    raise ValueError(
                        f"shard extent {erw}x{erh} incompatible with "
                        f"raster tiling (needs multiples of 8)"
                    )
            tile_eff.append((tile_w_eff, tile_h_eff))
            batch_ok = sublane_ok = False
            if use_pallas:
                if pipe.raster_sublane:
                    why = _reduction_ineligible_reason(pipe, tile_w_eff, True)
                    sublane_ok = why is None
                    if not sublane_ok:
                        self._signal_fallback(pipe, "raster_sublane", why)
                if pipe.raster_batch and not pipe.raster_sublane:
                    why = _reduction_ineligible_reason(pipe, tile_w_eff, False)
                    batch_ok = why is None
                    if not batch_ok:
                        self._signal_fallback(pipe, "raster_batch", why)
            variant_ok.append((batch_ok, sublane_ok))

        if shard is not None:
            if shard.get("geometry") and not use_pallas:
                from .utils.errors import FeatureNotPresentError

                raise FeatureNotPresentError(
                    "geometry-axis parallelism requires the Pallas backend "
                    "(plane-interpolated varyings make the depth-composited "
                    "winner shadeable on every shard)"
                )

        def frame(dyn, clear_color):
            fbs = (nsamp, erh, erw) if coverage_msaa else (erh, erw)
            if shard is not None:
                ox, oy = shard["origin_fn"]()
                raster_origin = (
                    jnp.asarray(ox, jnp.int32) * scale,
                    jnp.asarray(oy, jnp.int32) * scale,
                )
                geometry = shard.get("geometry")
            else:
                raster_origin = (0, 0)
                geometry = None
            vis = VisBuffer(
                tri_id=jnp.full(fbs, -1, jnp.int32),
                depth_q=jnp.full(fbs, clear_depth_q),
                b0=jnp.zeros(fbs, jnp.float32),
                b1=jnp.zeros(fbs, jnp.float32),
                b2=jnp.zeros(fbs, jnp.float32),
            )
            # Pass 1: visibility (rasterize every draw into the shared buffer).
            per_draw = []
            offset = 0
            overflowed = jnp.bool_(False)
            for i, d in enumerate(dyn):
                pipe = pipelines[i]
                stencil_state = pipe.stencil if pipe.stencil.enable else None
                prev_stencil = vis.stencil if i > 0 else None
                mesh = Mesh(attributes=d["attrs"], indices=d["indices"])
                inst = d["instances"]
                # Per-instance frustum culling (Pipeline.instance_cull,
                # ops/cull.py): compact provably-offscreen instances out of
                # the stream BEFORE expansion, carrying ORIGINAL triangle
                # ids through the raster records so coverage/depth/tri_id
                # stay bit-identical.  Requires the Pallas backend
                # (gather-free shading: the XLA paths gather varyings/setup
                # rows by local tri id, which original ids would overrun)
                # and no clipper (it re-orders the stream).
                tri_ids_local = None  # (stream,) original ids, else arange
                ntri_logical = None
                if pipe.instance_cull is not None and inst:
                    why = None
                    if not use_pallas:
                        why = "XLA raster backend (shading gathers by local id)"
                    elif pipe.near_clip:
                        why = "near_clip enabled (the clipper re-orders the stream)"
                    if why is not None:
                        self._signal_fallback(pipe, "instance_cull", why)
                    else:
                        from .ops.cull import compact_instances, instance_visibility

                        import math

                        num_inst = next(iter(inst.values())).shape[0]
                        budget = max(
                            int(math.ceil(num_inst * pipe.instance_cull)), 1
                        )
                        visible = instance_visibility(
                            shaders[i], mesh, inst, d["uniforms"], rw, rh
                        )
                        inst, orig_idx, cull_of = compact_instances(
                            inst, visible, budget
                        )
                        overflowed = overflowed | cull_of
                        tpi = mesh.num_triangles
                        ntri_logical = num_inst * tpi
                        tri_ids_local = (
                            orig_idx[:, None] * jnp.int32(tpi)
                            + jnp.arange(tpi, dtype=jnp.int32)[None, :]
                        ).reshape(-1)
                attrs, tri_idx = expand_instances(mesh, inst)
                clip, varyings = shaders[i].vertex(attrs, d["uniforms"])
                clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
                if pipe.near_clip:
                    from .ops.clip import clip_near

                    clip_tri, var_tri = clip_near(clip_tri, var_tri)
                ntri_draw = clip_tri.shape[0]
                if geometry is not None:
                    # Slice this draw's triangle stream by the geometry-axis
                    # index: every shard rasterizes 1/ng of the triangles
                    # (vertex math is replicated — raster is the hot stage),
                    # then the per-shard winners are depth-composited.
                    ng, g_idx_fn, _merge = geometry
                    g_idx = g_idx_fn()
                    per = -(-ntri_draw // ng)
                    pad = per * ng - ntri_draw
                    if pad:
                        clip_tri = jnp.pad(clip_tri, ((0, pad), (0, 0), (0, 0)))
                        var_tri = {
                            k: jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
                            for k, v in var_tri.items()
                        }
                    ntri_draw = per * ng
                    clip_tri = jax.lax.dynamic_slice_in_dim(clip_tri, g_idx * per, per)
                    var_tri = {
                        k: jax.lax.dynamic_slice_in_dim(v, g_idx * per, per)
                        for k, v in var_tri.items()
                    }
                    if tri_ids_local is not None:
                        # Padding rows are degenerate (zero clip -> dropped
                        # in setup), so their id value never surfaces.
                        if pad:
                            tri_ids_local = jnp.pad(tri_ids_local, (0, pad))
                        tri_ids_local = jax.lax.dynamic_slice_in_dim(
                            tri_ids_local, g_idx * per, per
                        )
                        draw_id_offset = offset + tri_ids_local
                    else:
                        draw_id_offset = offset + g_idx * per
                else:
                    draw_id_offset = (
                        offset
                        if tri_ids_local is None
                        else offset + tri_ids_local
                    )
                ts = setup_triangles(
                    clip_tri,
                    rw,
                    rh,
                    cull_mode=pipe.cull_mode,
                    front_face=pipe.front_face,
                    scissor=self._scaled_scissor(pipe, scale),
                    bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP if coverage_msaa else 0,
                    depth_bias=(
                        pipe.depth.bias_constant,
                        pipe.depth.bias_slope,
                        pipe.depth.bias_clamp,
                    )
                    if pipe.depth.bias_enable
                    else None,
                )
                depth_clip_mode = "clamp" if pipe.depth.clamp else pipe.depth.clip
                interp = invw = None
                var_keys = sorted(var_tri)
                # Scissor on the tiled path: the in-kernel mask works in
                # local tile coordinates, so sharded draws rasterize
                # unmasked (bboxes are still clamped to the global scissor
                # in setup) and revert to the pre-draw state outside the
                # rect — bit-identical to in-kernel masking, since all
                # per-pixel updates are suppressed either way.
                shard_scissor = shard is not None and pipe.scissor is not None
                kernel_scissor = (
                    None if shard_scissor else self._scaled_scissor(pipe, scale)
                )
                prev_vis = vis

                def apply_shard_scissor(vis_new):
                    if not shard_scissor:
                        return vis_new
                    sx0, sy0, sx1, sy1 = self._scaled_scissor(pipe, scale)
                    gx = raster_origin[0] + jax.lax.broadcasted_iota(
                        jnp.int32, (erh, erw), 1
                    )
                    gy = raster_origin[1] + jax.lax.broadcasted_iota(
                        jnp.int32, (erh, erw), 0
                    )
                    m = (gx >= sx0) & (gx < sx1) & (gy >= sy0) & (gy < sy1)
                    if coverage_msaa:
                        m = m[None]
                    new_st = vis_new.stencil
                    if new_st is not None:
                        prev_st = prev_vis.stencil
                        if prev_st is None:
                            prev_st = jnp.full_like(
                                new_st, jnp.int32(cfg.clear_stencil & 0xFF)
                            )
                        new_st = jnp.where(m, new_st, prev_st)
                    return vis_new._replace(
                        tri_id=jnp.where(m, vis_new.tri_id, prev_vis.tri_id),
                        depth_q=jnp.where(m, vis_new.depth_q, prev_vis.depth_q),
                        b0=jnp.where(m, vis_new.b0, prev_vis.b0),
                        b1=jnp.where(m, vis_new.b1, prev_vis.b1),
                        b2=jnp.where(m, vis_new.b2, prev_vis.b2),
                        stencil=new_st,
                    )
                if use_pallas:
                    from .ops.raster_pallas import rasterize_vis_pallas

                    # Flatten varyings into channels so the kernel
                    # interpolates them in-raster (no per-pixel gathers).
                    channels = (
                        jnp.concatenate([var_tri[k] for k in var_keys], axis=-1)
                        if var_keys
                        else None
                    )
                    num_t = clip_tri.shape[0]
                    # Sharded: global tile origins must stay aligned to the
                    # tile size for the canonical-depth-anchor proof, so the
                    # tile was clamped to divide the shard extent above (all
                    # values divide 128, so the gcd does too).
                    tile_w_eff, tile_h_eff = tile_eff[i]
                    out = rasterize_vis_pallas(
                        ts,
                        erw,
                        erh,
                        tile_w=tile_w_eff,
                        tile_h=tile_h_eff,
                        depth_test=pipe.depth.test,
                        depth_compare=pipe.depth.compare,
                        depth_write=pipe.depth.write,
                        depth_clip=depth_clip_mode,
                        depth_clear=clear_depth,
                        max_pairs=max(int(num_t * pipe.raster_pairs_factor), 1024),
                        slots=(
                            None
                            if pipe.raster_slots_factor is None
                            else max(int(num_t * pipe.raster_slots_factor), 1024)
                        ),
                        init=None if i == 0 else vis,
                        id_offset=draw_id_offset,
                        origin=raster_origin,
                        channels=channels,
                        perspective=pipe.perspective_correct,
                        scissor=kernel_scissor,
                        skip_losers=pipe.raster_skip_losers,
                        two_pass=pipe.raster_two_pass,
                        msaa4=coverage_msaa,
                        stencil=stencil_state,
                        stencil_clear=cfg.clear_stencil,
                        # Batched/sublane reduction only where its depth-mode
                        # eligibility holds (precomputed above; an ineligible
                        # request warned / raised there).
                        batch=pipe.raster_batch if variant_ok[i][0] else 0,
                        sublane=variant_ok[i][1],
                        sublane_group=pipe.raster_group,
                        unroll=pipe.raster_unroll,
                        assemble=pipe.raster_assemble,
                        tmpl=pipe.raster_tmpl,
                        # Sub-tile band binning only where the sublane
                        # variant actually runs (and not under MSAA — the
                        # MSAA sublane kernel has no band path yet).
                        bin_rows=(
                            pipe.raster_bin_rows
                            if variant_ok[i][1] and not coverage_msaa
                            else None
                        ),
                        return_overflow=True,
                        # Mosaic has no CPU target; tests on the CPU
                        # backend run the kernel interpreted.
                        interpret=self.device.platform == "cpu",
                    )
                    if channels is None:
                        vis, of = out
                    else:
                        vis, interp, invw, of = out
                    overflowed = overflowed | of
                    if vis.stencil is None and prev_stencil is not None:
                        # Stencil-disabled draws leave the attachment as-is.
                        vis = vis._replace(stencil=prev_stencil)
                    vis = apply_shard_scissor(vis)
                    if geometry is not None:
                        # Depth-composite this draw's per-shard winners so
                        # every shard continues from the merged state.
                        merge_fn = geometry[2]
                        vis, interp, invw = merge_fn(vis, interp, invw, pipe.depth)
                else:
                    vis = raster_xla.rasterize_vis(
                        ts,
                        erw,
                        erh,
                        depth_test=pipe.depth.test,
                        depth_compare=pipe.depth.compare,
                        depth_write=pipe.depth.write,
                        depth_clip=depth_clip_mode,
                        init=vis,
                        id_offset=draw_id_offset,
                        origin=raster_origin,
                        scissor=kernel_scissor,
                        stencil=stencil_state,
                        stencil_clear=cfg.clear_stencil,
                        msaa4=coverage_msaa,
                    )
                    vis = apply_shard_scissor(vis)
                # Snapshot this draw's visibility state (free: jax arrays
                # are immutable).  Compositing each draw against its own
                # snapshot gives Vulkan's sequential semantics: a draw's
                # fragments contribute color wherever they passed the
                # depth/stencil tests *at their point in the frame*, even
                # if a later draw overwrites the pixel afterwards.
                # With instance culling the draw's LOGICAL id range spans
                # the original (pre-compaction) triangle count — pass-2
                # masks and the next draw's id base use it, so ids never
                # collide across draws.
                ntri_ids = ntri_draw if ntri_logical is None else ntri_logical
                per_draw.append((ts, var_tri, offset, ntri_ids, interp, invw, vis))
                offset += ntri_ids

            # Pass 2: deferred shading + blend composite, one pass per draw.
            # Color is planar (4, rh, rw) on device (see _blend docstring);
            # coverage MSAA carries a leading per-sample axis (S, 4, rh, rw)
            # until the resolve.
            cshape = (nsamp, 4, erh, erw) if coverage_msaa else (4, erh, erw)
            clear = clear_color.astype(jnp.float32).reshape(
                (1,) * (len(cshape) - 3) + (4, 1, 1)
            )
            color = jnp.broadcast_to(clear, cshape)
            msaa_prefused = False  # set when a draw fused mask+resolve
            for i, d in enumerate(dyn):
                ts, var_tri, off, ntri, interp, invw, vis_i = per_draw[i]
                pipe = pipelines[i]
                mask = (vis_i.tri_id >= off) & (vis_i.tri_id < off + ntri)
                local = jnp.where(mask, vis_i.tri_id - off, -1)
                vis_local = vis_i._replace(tri_id=local)
                if interp is not None or coverage_msaa or use_pallas:
                    # Gather-free shading: attributes were interpolated by
                    # the raster kernel as screen-space planes.  (With
                    # coverage MSAA every array gains a leading sample axis
                    # and the fragment shader is vmapped over it: attributes
                    # were evaluated at the pixel center of each sample's
                    # winner — shading cost is per sample layer, raster and
                    # binning cost are per pixel.)
                    interp_vals = None
                    if interp is not None:
                        if pipe.perspective_correct:
                            denom = jnp.where(invw == 0, jnp.float32(1.0), invw)
                            interp_vals = interp / denom[None]
                        else:
                            interp_vals = interp

                    def build_frag(iv):
                        frag = {}
                        if iv is not None:
                            c0 = 0
                            for k in sorted(var_tri):
                                c = var_tri[k].shape[-1]
                                frag[k] = jnp.moveaxis(iv[c0 : c0 + c], 0, -1)
                                c0 += c
                        return frag

                    if coverage_msaa:
                        uni = d["uniforms"]
                        xla_interp_needed = interp_vals is None and bool(var_tri)

                        from .ops import compact as cp

                        use_compact_msaa = (
                            pipe.shade_compact is not None
                            and use_pallas
                            and not xla_interp_needed
                            and cp.eligible(erh, erw)
                        )
                        # Single opaque draw: the per-sample blend is the
                        # fragment color (_blend returns src when disabled
                        # with a full write mask), so mask-select + box
                        # resolve fold into ONE fused pass — value-identical
                        # to blend + where + mean but skips materializing
                        # two (S, 4, H, W) intermediates (0.53 + 0.20 ms of
                        # the 1.34 ms MSAA-4x cube, tools/probe_msaa.py).
                        fuse_resolve = (
                            len(dyn) == 1
                            and not use_compact_msaa
                            and not pipe.blend.enable
                            and set(pipe.blend.write_mask) == set("rgba")
                        )
                        msaa_prefused = fuse_resolve

                        def shade_full_msaa(cur):
                            frag = build_frag(interp_vals)
                            if xla_interp_needed:
                                # XLA backend: per-sample varying
                                # interpolation (pixel gathers — the
                                # portable path's cost model; Pallas
                                # interpolates in-raster).
                                frag.update(
                                    jax.vmap(
                                        lambda vl: raster_xla.interpolate_varyings(
                                            vl,
                                            var_tri,
                                            ts.inv_w,
                                            pipe.perspective_correct,
                                        )
                                    )(vis_local)
                                )
                            frag["tri_id"] = vis_local.tri_id
                            frag["depth"] = vis_local.depth
                            frag["bary"] = jnp.stack(
                                [vis_i.b0, vis_i.b1, vis_i.b2], axis=-1
                            )
                            rgba = jax.vmap(
                                lambda fr: shaders[i].fragment(fr, uni)
                            )(frag)
                            rgba = jnp.transpose(rgba, (0, 3, 1, 2))
                            if fuse_resolve:
                                return jnp.mean(
                                    jnp.where(mask[:, None], rgba, clear), axis=0
                                )
                            blended = jax.vmap(
                                lambda s, c: _blend(s, c, pipe.blend)
                            )(rgba, cur)
                            return jnp.where(mask[:, None], blended, cur)

                        if use_compact_msaa:
                            # Covered-tile-compacted MSAA shading: the 4x
                            # per-sample fragment rate scales with this
                            # draw's coverage instead of the framebuffer.
                            # Sample layers fold into the tile-row channel
                            # axis, so compaction still costs ONE row
                            # gather/scatter per budget tier; tiles covered
                            # in ANY sample layer are selected (per-sample
                            # masks suppress uncovered layers at merge).
                            S_ = mask.shape[0]
                            nt = cp.num_tiles(erh, erw)
                            fracs = (
                                pipe.shade_compact
                                if isinstance(pipe.shade_compact, tuple)
                                else (pipe.shade_compact,)
                            )
                            budgets = sorted(
                                {
                                    min(nt, max(8, -(-int(nt * f) // 8) * 8))
                                    for f in fracs
                                }
                            )
                            order, cov_count = cp.covered_tile_order(
                                jnp.any(mask, axis=0), erh, erw
                            )
                            fragment = shaders[i].fragment
                            blend_state = pipe.blend
                            persp_div = (
                                interp is not None and pipe.perspective_correct
                            )
                            th, tw = cp.TILE_H, cp.TILE_W

                            def shade_tiles(cur, budget):
                                sel = order[:budget]
                                parts = []  # (c, S, H, W) blocks
                                if interp is not None:
                                    parts.append(interp)
                                if persp_div:
                                    parts.append(invw[None])
                                parts.append(vis_local.depth[None])
                                parts.append(
                                    jnp.stack([vis_i.b0, vis_i.b1, vis_i.b2])
                                )
                                f32 = jnp.concatenate(parts, axis=0)
                                cin = f32.shape[0]
                                g_f = cp.gather_tiles(
                                    cp.tile_rows(
                                        f32.reshape(cin * S_, erh, erw), erh, erw
                                    ),
                                    sel,
                                    cin * S_,
                                ).reshape(-1, cin, S_, th, tw)
                                g_i = cp.gather_tiles(
                                    cp.tile_rows(vis_local.tri_id, erh, erw),
                                    sel,
                                    S_,
                                )  # (B, S, th, tw)
                                bsz = g_f.shape[0]
                                frag_t = {}
                                c0 = 0
                                if interp is not None:
                                    nvar = interp.shape[0]
                                    vals = g_f[:, :nvar]
                                    if persp_div:
                                        denom = g_f[:, nvar : nvar + 1]
                                        vals = vals / jnp.where(
                                            denom == 0, jnp.float32(1.0), denom
                                        )
                                    for k in sorted(var_tri):
                                        c = var_tri[k].shape[-1]
                                        frag_t[k] = jnp.moveaxis(
                                            vals[:, c0 : c0 + c], 1, -1
                                        )  # (B, S, th, tw, c)
                                        c0 += c
                                    c0 += 1 if persp_div else 0
                                frag_t["depth"] = g_f[:, c0]
                                frag_t["bary"] = jnp.moveaxis(
                                    g_f[:, c0 + 1 : c0 + 4], 1, -1
                                )
                                frag_t["tri_id"] = g_i
                                flat = jax.tree.map(
                                    lambda x: x.reshape(
                                        (bsz * S_,) + x.shape[2:]
                                    ),
                                    frag_t,
                                )
                                rgba_t = jax.vmap(
                                    lambda fr: fragment(fr, uni)
                                )(flat)  # (B*S, th, tw, 4)
                                rows_c = cp.tile_rows(
                                    cur.reshape(S_ * 4, erh, erw), erh, erw
                                )
                                color_t = cp.gather_tiles(
                                    rows_c, sel, S_ * 4
                                ).reshape(bsz * S_, 4, th, tw)
                                blended_t = jax.vmap(
                                    lambda s_, c_: _blend(s_, c_, blend_state)
                                )(jnp.transpose(rgba_t, (0, 3, 1, 2)), color_t)
                                out_t = jnp.where(
                                    (g_i.reshape(bsz * S_, th, tw) >= 0)[
                                        :, None
                                    ],
                                    blended_t,
                                    color_t,
                                )
                                new_rows = cp.scatter_tiles(
                                    rows_c, sel, out_t.reshape(bsz, S_ * 4, th, tw)
                                )
                                return cp.untile_rows(
                                    new_rows, S_ * 4, erh, erw
                                ).reshape(S_, 4, erh, erw)

                            branch = shade_full_msaa
                            for b in reversed(budgets):

                                def branch(cur, _b=b, _next=branch):
                                    return jax.lax.cond(
                                        cov_count <= _b,
                                        lambda c: shade_tiles(c, _b),
                                        _next,
                                        cur,
                                    )

                            color = branch(color)
                            continue

                        color = shade_full_msaa(color)
                        continue

                    def shade_full(cur):
                        frag = build_frag(interp_vals)
                        frag["tri_id"] = vis_local.tri_id
                        frag["depth"] = vis_local.depth
                        frag["bary"] = jnp.stack(
                            [vis_i.b0, vis_i.b1, vis_i.b2], axis=-1
                        )
                        rgba = jnp.transpose(
                            shaders[i].fragment(frag, d["uniforms"]), (2, 0, 1)
                        )
                        blended = _blend(rgba, cur, pipe.blend)
                        return jnp.where(mask[None], blended, cur)

                    from .ops import compact as cp

                    if (
                        pipe.shade_compact is not None
                        and use_pallas
                        and cp.eligible(erh, erw)
                    ):
                        # Covered-tile-compacted shading: per-pixel fragment
                        # cost (incl. texture-tap gathers) scales with this
                        # draw's coverage, not the framebuffer.  See
                        # ops/compact.py for the design.  The compacted
                        # stream is BUDGET-sized (static shapes), so the
                        # knob is a ladder of budgets: a lax.cond chain
                        # picks the tightest tier the frame's covered-tile
                        # count fits, falling back to full-screen shading
                        # past the largest (cond, not select — one tier's
                        # cost per frame).
                        nt = cp.num_tiles(erh, erw)
                        fracs = (
                            pipe.shade_compact
                            if isinstance(pipe.shade_compact, tuple)
                            else (pipe.shade_compact,)
                        )
                        budgets = sorted(
                            {
                                min(nt, max(8, -(-int(nt * f) // 8) * 8))
                                for f in fracs
                            }
                        )
                        order, cov_count = cp.covered_tile_order(mask, erh, erw)
                        uni = d["uniforms"]
                        fragment = shaders[i].fragment
                        blend_state = pipe.blend

                        # Gather RAW interpolators and divide by 1/w on the
                        # compacted tiles (elementwise, so gather-then-divide
                        # is bitwise equal to divide-then-gather — and skips
                        # a full-screen divide + materialization).
                        persp_div = interp is not None and pipe.perspective_correct

                        def shade_tiles(cur, budget):
                            sel = order[:budget]
                            parts = [] if interp is None else [interp]
                            if persp_div:
                                parts.append(invw[None])
                            parts.append(vis_local.depth[None])
                            parts.append(jnp.stack([vis_i.b0, vis_i.b1, vis_i.b2]))
                            f32 = jnp.concatenate(parts, axis=0)
                            cin = f32.shape[0]
                            # (B, C, 8, 128) planar micro-framebuffers.
                            g_f = cp.gather_tiles(
                                cp.tile_rows(f32, erh, erw), sel, cin
                            )
                            g_i = cp.gather_tiles(
                                cp.tile_rows(vis_local.tri_id[None], erh, erw),
                                sel,
                                1,
                            )[:, 0]
                            frag_t = {}
                            c0 = 0
                            if interp is not None:
                                nvar = interp.shape[0]
                                vals = g_f[:, :nvar]
                                if persp_div:
                                    denom = g_f[:, nvar : nvar + 1]
                                    vals = vals / jnp.where(
                                        denom == 0, jnp.float32(1.0), denom
                                    )
                                for k in sorted(var_tri):
                                    c = var_tri[k].shape[-1]
                                    frag_t[k] = jnp.moveaxis(
                                        vals[:, c0 : c0 + c], 1, -1
                                    )
                                    c0 += c
                                c0 += 1 if persp_div else 0
                            frag_t["depth"] = g_f[:, c0]
                            frag_t["bary"] = jnp.moveaxis(
                                g_f[:, c0 + 1 : c0 + 4], 1, -1
                            )
                            frag_t["tri_id"] = g_i
                            rgba_t = jax.vmap(lambda fr: fragment(fr, uni))(frag_t)
                            rows_c = cp.tile_rows(cur, erh, erw)
                            color_t = cp.gather_tiles(rows_c, sel, 4)
                            blended_t = jax.vmap(
                                lambda s_, c_: _blend(s_, c_, blend_state)
                            )(jnp.transpose(rgba_t, (0, 3, 1, 2)), color_t)
                            out_t = jnp.where(
                                (g_i >= 0)[:, None], blended_t, color_t
                            )
                            new_rows = cp.scatter_tiles(rows_c, sel, out_t)
                            return cp.untile_rows(new_rows, 4, erh, erw)

                        branch = shade_full
                        for b in reversed(budgets):
                            def branch(cur, _b=b, _next=branch):
                                return jax.lax.cond(
                                    cov_count <= _b,
                                    lambda c: shade_tiles(c, _b),
                                    _next,
                                    cur,
                                )

                        color = branch(color)
                        continue

                    color = shade_full(color)
                    continue
                else:
                    rgba = raster_xla.shade_deferred(
                        vis_local,
                        ts,
                        var_tri,
                        shaders[i].fragment,
                        d["uniforms"],
                        background=jnp.transpose(color, (1, 2, 0)),
                        perspective=pipe.perspective_correct,
                    )
                    rgba = jnp.transpose(rgba, (2, 0, 1))
                blended = _blend(rgba, color, pipe.blend)
                color = jnp.where(mask[None], blended, color)

            if coverage_msaa and not msaa_prefused:
                # Coverage resolve: box-average the per-sample colors.
                color = jnp.mean(color, axis=0)
            if scale == 2:
                # MSAA-4x box resolve (planar).  reduce_window: a reshape
                # with tiny trailing dims lane-pads 32x, and lane-strided
                # slicing is an order of magnitude slower still.
                resolved = jax.lax.reduce_window(
                    color,
                    jnp.float32(0.0),
                    jax.lax.add,
                    window_dimensions=(1, 2, 2),
                    window_strides=(1, 2, 2),
                    padding="VALID",
                ) * jnp.float32(0.25)
            else:
                resolved = color
            return resolved, vis.depth_q, vis.tri_id, vis.stencil, overflowed

        return jax.jit(frame) if jit else frame

    # -- batched frame sequences -------------------------------------------

    def render_sequence(
        self,
        pipeline: Pipeline,
        mesh: Mesh,
        uniforms_seq=None,
        instances=None,
        return_frames: bool = False,
        num_frames: int | None = None,
        static_uniforms=None,
        uniforms_fn=None,
        t0: float = 0.0,
        dt: float = 1.0 / 60.0,
    ):
        """Render N frames in ONE device dispatch (lax.scan over uniforms).

        The reference submits one command buffer per frame and syncs with
        fences (main.cpp:2141-2186); on TPU the far better schedule for
        offline/animation rendering is a whole sequence as a single
        compiled program — no per-frame host round trips at all.

        Args:
          uniforms_seq: pytree whose leaves are stacked per-frame arrays
            with leading dimension N (e.g. {"model": (N, 4, 4), ...}).
          uniforms_fn: alternative to ``uniforms_seq`` — a traceable
            ``fn(t) -> uniforms dict`` evaluated ON DEVICE inside the
            scan at ``t = t0 + dt * frame_index`` (the full device-side
            analog of the reference's per-frame rotate_cube,
            main.cpp:788-809).  Needs ``num_frames``.  The function
            object is part of the compiled program's identity, so reuse
            one fn across calls; t0/dt are traced (no recompiles).
          return_frames: if True, also return all color frames
            (N, H, W, 4) — memory-heavy; otherwise only per-frame
            checksums.
        Returns:
          checksums (N,) f32, or (checksums, colors (N, H, W, 4)).
        """
        return self.render_sequence_multi(
            [
                {
                    "pipeline": pipeline,
                    "mesh": mesh,
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
        """Multi-draw ``render_sequence``: N frames of a recorded draw
        list in ONE device dispatch.

        Blend layers, stencil passes, and mixed-pipeline frames get the
        same batched lax.scan schedule as single-draw animation (and the
        same elision-proof benchmarking story — per-frame dispatch costs
        40-70 ms on this tunnel).

        Args:
          seq_draws: list of dicts with keys
            pipeline, mesh, uniforms_seq (pytree of (N, ...) stacked
            per-frame arrays) OR uniforms_fn (traceable ``fn(t)`` run
            on device at ``t = t0 + dt * frame_index``), instances
            (optional), static_uniforms (optional; shared across
            frames, e.g. textures).
          t0, dt: the uniforms_fn time base; traced scalars, so varying
            them does not recompile.
        Returns:
          checksums (N,) f32, or (checksums, colors) if return_frames.
        """
        self.begin_frame()
        # Validate via the normal draw path using frame 0's uniforms.
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
        draws = self._draws
        self._draws, self._in_frame = [], False

        # Sequence-constant data (mesh attributes, instance tables, static
        # uniforms/textures) is CLOSURE-CAPTURED by the scanned program
        # rather than passed as jit arguments: measured on v5e
        # (tools/probe_seq.py, 1M-tri Blinn-Phong), the same scan costs
        # 47.6 ms/frame with the mesh captured as compile-time constants
        # but 71.4 ms/frame with it as jit parameters — XLA keeps
        # loop-invariant relayout/copy work inside the scan for
        # parameters that it folds away for constants.  Captured arrays
        # are part of the program identity, so the cache key carries
        # their object ids; the cached closure keeps them alive, which
        # makes the ids collision-free while the entry exists.  Swapping
        # in a new (same-shape) mesh or texture therefore compiles a new
        # sequence program — render_sequence is the offline/animation
        # batch path, where per-sequence compiles amortize.
        base_dyn = self._dynamic_args(draws)
        # Generator meshes (scene.generated_mesh): synthesize the vertex
        # data IN-PROGRAM, once per dispatch before the scan, instead of
        # capturing it — a captured 1M-triangle mesh bakes ~144 MB of
        # constants into the executable (~505 MB raw, ~90 MB compressed
        # cache entry) whose remote serialize/load dominates bench/driver
        # wall time, while the generated form is pure code.  Per-frame
        # cost is unchanged: generation sits outside the lax.scan.
        gens = [getattr(sd["mesh"], "generator", None) for sd in seq_draws]
        for d, g in zip(base_dyn, gens):
            # Frame-0 uniforms are rebuilt per call (fresh arrays) and the
            # scan body replaces them anyway — keep them out of the
            # captured constants so their ids don't churn the cache key.
            d.pop("uniforms")
            if g is not None:
                d.pop("attrs")  # synthesized in seq(); never captured
        stats = [
            jax.tree.map(self._uniform_leaf, sd.get("static_uniforms") or {})
            for sd in seq_draws
        ]
        const_ids = tuple(id(x) for x in jax.tree.leaves((base_dyn, stats)))
        key = (
            "seq",
            self._cache_key(draws),
            return_frames,
            self._frame_clear[1],
            const_ids,
            tuple(id(fn) if fn is not None else None for fn in fns),
            tuple(id(g) if g is not None else None for g in gens),
        )
        program = self._program_cache.get(key)
        if program is None:
            single = self._build_program(draws, self._frame_clear[1], jit=False)

            def seq(useqs, ticks, tb, clear_color):
                # Generator meshes: synthesized once per dispatch, before
                # the scan.  Measured on v5e (tools/probe_capture.py, 1M
                # tris 1080p): any runtime-produced loop-invariant — jit
                # parameter, generated, barriered, AUTO-layouts, or
                # carry-threaded — pays a per-step in-scan layout
                # conversion worth +13-15 ms/frame that XLA folds away
                # only for captured constants (68.1-69.1 vs 53.6-56.3).
                # Generated meshes are therefore a size/speed TRADE, not
                # a free win; see models/demos.py big_mesh_demo.
                gen_attrs = [
                    g() if g is not None else None for g in gens
                ]

                def body(carry, xs):
                    us, tick = xs
                    ds = []
                    for i, d0 in enumerate(base_dyn):
                        d = dict(d0)
                        if gen_attrs[i] is not None:
                            d["attrs"] = gen_attrs[i]
                        if fns[i] is not None:
                            u = fns[i](tb[0] + tb[1] * tick.astype(jnp.float32))
                        else:
                            u = us[i]
                        d["uniforms"] = (
                            {**stats[i], **u} if isinstance(u, dict) else u
                        )
                        ds.append(d)
                    color, _depth_q, _tri_id, _stencil, of = single(ds, clear_color)
                    out = (jnp.sum(color), color) if return_frames else jnp.sum(color)
                    return carry | of, out

                # The ticks carry the frame count (and index uniforms_fn
                # draws) even when every uniforms tree is empty.
                overflowed, outs = jax.lax.scan(
                    body, jnp.bool_(False), (useqs, ticks)
                )
                return outs, overflowed

            program = jax.jit(seq)
            self._program_cache[key] = program

        n = num_frames
        useqs = []
        for sd, fn in zip(seq_draws, fns):
            us = sd.get("uniforms_seq") if fn is None else None
            useqs.append(jax.tree.map(self._uniform_leaf, us or {}))
            leaves = jax.tree.leaves(us) if us is not None else []
            if leaves:
                n = leaves[0].shape[0]
        if n is None:
            raise FrameError("render_sequence needs num_frames when uniforms are empty")
        ticks = jnp.arange(n, dtype=jnp.int32)
        tb = jnp.asarray([t0, dt], jnp.float32)
        clear_color = jnp.asarray(self._frame_clear[0], jnp.float32)
        outs, overflowed = program(tuple(useqs), ticks, tb, clear_color)
        # Pair-budget overflow across the whole sequence: raise in debug,
        # expose for callers (e.g. benchmarks validating their budgets).
        self.last_sequence_overflowed = overflowed
        if self.config.debug and bool(overflowed):
            raise AllocationError(
                "raster pair buffer overflow during render_sequence; raise "
                "Pipeline.raster_pairs_factor"
            )
        return outs

    # -- introspection -----------------------------------------------------

    @property
    def num_cached_programs(self) -> int:
        return len(self._program_cache)
