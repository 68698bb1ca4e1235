"""Pure-XLA (non-Pallas) rasterizer: the portable correctness path.

Renders by scanning over triangles and evaluating exact edge functions at
every pixel (emulated 64-bit integer math, see ops/fixedpoint.py), producing
a *visibility buffer* — per-pixel winning triangle id, depth, and
barycentrics — followed by a single deferred shading pass.

This path runs on any backend (CPU tests, TPU), is bit-identical in
coverage and depth to the CPU oracle by construction, and is the oracle for
the fast Pallas kernel.  Its cost is O(T * H * W), so it is meant for
small-to-medium triangle counts; the tile-binned Pallas kernel
(ops/raster_pallas.py) is the production path.

The reference's equivalent stage is the GPU's fixed-function rasterizer +
fragment pipeline configured at /root/reference/src/main.cpp:1777-1842 and
driven by draw() at main.cpp:2103.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import fixedpoint as fp
from .setup import TriSetup, depth_tile_anchor, depth_at_pixel


class VisBuffer(NamedTuple):
    """Per-pixel visibility: which triangle won, at what depth, where.

    With coverage-sample MSAA every field gains a leading sample axis.
    ``stencil`` is populated only when a draw has stencil enabled (the
    S8 half of the reference's D24S8 attachment, main.cpp:1472-1484).
    """

    tri_id: jnp.ndarray  # int32 (H, W), -1 = background
    depth_q: jnp.ndarray  # int32 (H, W) quantized depth (1.0 == 2^30)
    b0: jnp.ndarray  # f32 (H, W) barycentric weight of v0
    b1: jnp.ndarray  # f32 (H, W)
    b2: jnp.ndarray  # f32 (H, W)
    stencil: jnp.ndarray | None = None  # int32 (H, W) 8-bit stencil values

    @property
    def depth(self) -> jnp.ndarray:
        """Depth as float32 in [0, 1]."""
        return self.depth_q.astype(jnp.float32) * jnp.float32(fp.DEPTH_Q_TO_F32)


_DEPTH_CMP = {
    "never": lambda z, d: jnp.zeros(z.shape, jnp.bool_),
    "less": lambda z, d: z < d,
    "equal": lambda z, d: z == d,
    "less_equal": lambda z, d: z <= d,
    "greater": lambda z, d: z > d,
    "not_equal": lambda z, d: z != d,
    "greater_equal": lambda z, d: z >= d,
    "always": lambda z, d: jnp.ones(z.shape, jnp.bool_),
}


def stencil_apply_op(op: str, sbuf, ref: int):
    """New 8-bit stencil value under ``op`` (before the write-mask merge).

    Shared by the XLA path and the Pallas kernels (plain jnp int32 math);
    mirrored in numpy by the oracle.  Semantics follow VkStencilOp.
    """
    if op == "keep":
        return sbuf
    if op == "zero":
        return jnp.zeros_like(sbuf)
    if op == "replace":
        return jnp.full_like(sbuf, jnp.int32(ref))
    if op == "increment_clamp":
        return jnp.minimum(sbuf + 1, jnp.int32(255))
    if op == "decrement_clamp":
        return jnp.maximum(sbuf - 1, jnp.int32(0))
    if op == "invert":
        return (~sbuf) & jnp.int32(0xFF)
    if op == "increment_wrap":
        return (sbuf + 1) & jnp.int32(0xFF)
    if op == "decrement_wrap":
        return (sbuf - 1) & jnp.int32(0xFF)
    raise ValueError(op)


def stencil_update(state, sbuf, covered, s_pass, d_pass):
    """Post-fragment stencil buffer: per-pixel op selection + write mask.

    covered: fragments that reached the stencil test; s_pass: stencil
    test verdict; d_pass: depth test verdict (True where depth test is
    off).  Op selection per VkStencilOpState: fail_op on stencil fail,
    depth_fail_op on stencil pass + depth fail, pass_op on both passing.
    """
    new_fail = stencil_apply_op(state.fail_op, sbuf, state.ref)
    new_dfail = stencil_apply_op(state.depth_fail_op, sbuf, state.ref)
    new_pass = stencil_apply_op(state.pass_op, sbuf, state.ref)
    nv = jnp.where(s_pass, jnp.where(d_pass, new_pass, new_dfail), new_fail)
    wm = jnp.int32(state.write_mask)
    merged = (sbuf & ~wm) | (nv & wm)
    return jnp.where(covered, merged, sbuf)


def stencil_test(state, sbuf):
    """(ref & compare_mask) COMPARE (stencil & compare_mask), VkCompareOp."""
    cm = jnp.int32(state.compare_mask)
    ref = jnp.full_like(sbuf, jnp.int32(state.ref) & cm)
    return _DEPTH_CMP[state.compare](ref, sbuf & cm)


def _i64_ge0(hi, lo):
    return hi >= 0


def _i64_gt0(hi, lo):
    return (hi > 0) | ((hi == 0) & (lo != 0))


def rasterize_vis(
    ts: TriSetup,
    width: int,
    height: int,
    depth_test: bool = True,
    depth_compare: str = "less",
    depth_write: bool = True,
    depth_clear: float = 1.0,
    depth_clip: bool = True,
    init: VisBuffer | None = None,
    id_offset: int = 0,
    origin=(0, 0),
    scissor=None,
    stencil=None,
    stencil_clear: int = 0,
    msaa4: bool = False,
) -> VisBuffer:
    """Scan all triangles, exact edge tests at every pixel.

    ``origin`` is the global pixel coordinate of this buffer's top-left
    corner — (0, 0) for single-device rendering; a (possibly traced)
    per-shard offset for tile-parallel rendering (parallel/tiled.py).
    All spec math (edge anchors, canonical depth tiles) uses global
    coordinates, so a tiled render is bit-identical to a monolithic one.

    ``stencil`` is an optional pipeline.StencilState; when given (and
    enabled) the returned VisBuffer carries a stencil plane, initialized
    to ``stencil_clear`` (or continued from ``init.stencil``).

    ``msaa4``: coverage-sample MSAA-4x — every VisBuffer plane gains a
    leading sample axis of 4.  Coverage and depth evaluate per sample
    (edge values stepped by the per-triangle scalar A*ddx + B*ddy at the
    standard positions; depth by (dzdx_q*ddx + dzdy_q*ddy) >> 4 per the
    spec extension in ops/fixedpoint.py), barycentrics stay at the pixel
    center.  Bit-identical to oracle.rasterize_msaa4 and to the Pallas
    _raster_kernel_msaa4, so ``RendererConfig.msaa=4`` means the same
    image on every backend.  Pass ``ts`` set up with
    bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP.
    """
    cmp_fn = _DEPTH_CMP[depth_compare]
    py, px = jnp.mgrid[0:height, 0:width]
    px = px.astype(jnp.int32) + jnp.asarray(origin[0], jnp.int32)
    py = py.astype(jnp.int32) + jnp.asarray(origin[1], jnp.int32)
    px_fp, py_fp = fp.pixel_center_fp(px, py)
    # Canonical depth-anchor grid (spec: 128-px tiles).
    anchor_x = (px // fp.DEPTH_TILE) * fp.DEPTH_TILE
    anchor_y = (py // fp.DEPTH_TILE) * fp.DEPTH_TILE
    nsamp = 4 if msaa4 else 1
    offsets = fp.MSAA4_OFFSETS if msaa4 else ((0, 0),)
    fbs = (nsamp, height, width) if msaa4 else (height, width)

    use_stencil = stencil is not None and stencil.enable
    if init is None:
        init = VisBuffer(
            tri_id=jnp.full(fbs, -1, jnp.int32),
            depth_q=jnp.full(fbs, jnp.int32(round(depth_clear * fp.DEPTH_ONE_Q))),
            b0=jnp.zeros(fbs, jnp.float32),
            b1=jnp.zeros(fbs, jnp.float32),
            b2=jnp.zeros(fbs, jnp.float32),
        )
    if use_stencil and init.stencil is None:
        init = init._replace(stencil=jnp.full(fbs, jnp.int32(stencil_clear & 0xFF)))

    num_tris = ts.valid.shape[0]
    if num_tris == 0:  # empty draw: tracing the loop body would index a
        return init  # size-0 axis (the analog of a 0-vertex vkCmdDraw)

    def body(t, vis: VisBuffer) -> VisBuffer:
        valid = ts.valid[t]
        base_cov = jnp.ones((height, width), jnp.bool_)
        e_pairs = []
        e_f = []
        for i in range(3):
            dx = px_fp - ts.xf[t, i]
            dy = py_fp - ts.yf[t, i]
            e = fp.i64_add(fp.i64_mul_i32(ts.a[t, i], dx), fp.i64_mul_i32(ts.b[t, i], dy))
            e_pairs.append(e)
            hi_adj = e[0] + (e[1] < 0).astype(jnp.int32)
            e_f.append(
                hi_adj.astype(jnp.float32) * jnp.float32(4294967296.0)
                + e[1].astype(jnp.float32)
            )
        # Scissor to the triangle's bbox (also enforces screen clamp).
        bb = ts.bbox[t]
        base_cov = base_cov & (px >= bb[0]) & (px < bb[2]) & (py >= bb[1]) & (py < bb[3])
        if scissor is not None:
            sx0, sy0, sx1, sy1 = scissor
            base_cov = base_cov & (px >= sx0) & (px < sx1) & (py >= sy0) & (py < sy1)
        base_cov = base_cov & valid

        z_tile = depth_tile_anchor(
            ts.zq[t, 0],
            ts.xf[t, 0],
            ts.yf[t, 0],
            ts.gx[t],
            ts.gy[t],
            ts.zshift[t],
            anchor_x,
            anchor_y,
        )

        inv_area = ts.inv_area[t]
        nb0 = e_f[1] * inv_area
        nb1 = e_f[2] * inv_area
        nb2 = e_f[0] * inv_area

        def sample_pass(s, ddx, ddy, depth_s, stencil_s):
            """Coverage + depth/stencil verdicts at one sample position."""
            covered = base_cov
            for i in range(3):
                if ddx or ddy:
                    # Per-triangle scalar offset: |A|,|B| < 2^19 and the
                    # sample offsets are <= 6 subpixels, so i32 is exact.
                    off = ts.a[t, i] * jnp.int32(ddx) + ts.b[t, i] * jnp.int32(ddy)
                    e = fp.i64_add(e_pairs[i], fp.i64_from_i32(off))
                else:
                    e = e_pairs[i]
                inside = jnp.where(ts.bias[t, i] == 0, _i64_ge0(*e), _i64_gt0(*e))
                covered = covered & inside
            # Per-sample depth: plane value stepped by the sample offset in
            # quantized units BEFORE the range clamp (spec order; the i32
            # step fits: |dz| <= DEPTH_GRAD_CLAMP * 6 * 2 / 16 < 2^21).
            if ddx or ddy:
                dz_s = jnp.right_shift(
                    ts.dzdx_q[t] * jnp.int32(ddx) + ts.dzdy_q[t] * jnp.int32(ddy),
                    4,
                )
            else:
                dz_s = jnp.int32(0)
            z = depth_at_pixel(
                z_tile + dz_s,
                ts.dzdx_q[t],
                ts.dzdy_q[t],
                ts.zshift[t],
                px - anchor_x,
                py - anchor_y,
            )
            if depth_clip == "clamp":
                z = jnp.clip(z, 0, fp.DEPTH_ONE_Q)
            elif depth_clip:
                covered = covered & (z >= 0) & (z <= fp.DEPTH_ONE_Q)
            d_pass = cmp_fn(z, depth_s) if depth_test else jnp.ones_like(covered)
            if use_stencil:
                s_pass = stencil_test(stencil, stencil_s)
                new_stencil = stencil_update(stencil, stencil_s, covered, s_pass, d_pass)
                passes = covered & s_pass & d_pass
            else:
                new_stencil = stencil_s
                passes = covered & d_pass
            return passes, z, new_stencil

        if not msaa4:
            passes, z, new_stencil = sample_pass(
                0, 0, 0, vis.depth_q, vis.stencil
            )
            new_depth = jnp.where(passes, z, vis.depth_q) if depth_write else vis.depth_q
            return VisBuffer(
                tri_id=jnp.where(passes, t + jnp.int32(id_offset), vis.tri_id),
                depth_q=new_depth,
                b0=jnp.where(passes, nb0, vis.b0),
                b1=jnp.where(passes, nb1, vis.b1),
                b2=jnp.where(passes, nb2, vis.b2),
                stencil=new_stencil,
            )

        outs = [
            sample_pass(
                s,
                ddx,
                ddy,
                vis.depth_q[s],
                None if vis.stencil is None else vis.stencil[s],
            )
            for s, (ddx, ddy) in enumerate(offsets)
        ]
        passes = jnp.stack([o[0] for o in outs])
        z = jnp.stack([o[1] for o in outs])
        new_stencil = (
            jnp.stack([o[2] for o in outs]) if use_stencil else vis.stencil
        )
        new_depth = jnp.where(passes, z, vis.depth_q) if depth_write else vis.depth_q
        return VisBuffer(
            tri_id=jnp.where(passes, t + jnp.int32(id_offset), vis.tri_id),
            depth_q=new_depth,
            b0=jnp.where(passes, nb0[None], vis.b0),
            b1=jnp.where(passes, nb1[None], vis.b1),
            b2=jnp.where(passes, nb2[None], vis.b2),
            stencil=new_stencil,
        )

    return jax.lax.fori_loop(0, num_tris, body, init, unroll=False)


def interpolate_varyings(
    vis: VisBuffer,
    varyings: dict[str, jnp.ndarray],
    inv_w: jnp.ndarray,
    perspective: bool = True,
) -> dict[str, jnp.ndarray]:
    """Gather per-triangle vertex attributes and interpolate at each pixel.

    Args:
      varyings: dict of (T, 3, C) float32 per-vertex attributes.
      inv_w: (T, 3) per-vertex 1/clip_w from TriSetup.
    Returns dict of (H, W, C) interpolated attributes (perspective-correct
    when ``perspective``).
    """
    tid = jnp.maximum(vis.tri_id, 0)  # clamp background; masked later by caller
    b = jnp.stack([vis.b0, vis.b1, vis.b2], axis=-1)  # (H, W, 3)
    if perspective:
        iw = inv_w[tid]  # (H, W, 3)
        denom = jnp.sum(b * iw, axis=-1, keepdims=True)
        denom = jnp.where(denom == 0, jnp.float32(1.0), denom)
        w_persp = (b * iw) / denom
    else:
        w_persp = b
    out = {}
    for name, attr in varyings.items():
        av = attr[tid]  # (H, W, 3, C)
        out[name] = jnp.einsum("hwv,hwvc->hwc", w_persp, av)
    return out


def shade_deferred(
    vis: VisBuffer,
    ts: TriSetup,
    varyings: dict[str, jnp.ndarray],
    fragment_fn: Callable,
    uniforms,
    background: jnp.ndarray,
    perspective: bool = True,
) -> jnp.ndarray:
    """One vectorized fragment-shader pass over the whole framebuffer.

    ``fragment_fn(frag, uniforms) -> (H, W, 4)`` where ``frag`` is a dict of
    interpolated (H, W, C) varyings plus ``tri_id`` and ``depth``.
    """
    interp = interpolate_varyings(vis, varyings, ts.inv_w, perspective)
    frag = dict(interp)
    frag["tri_id"] = vis.tri_id
    frag["depth"] = vis.depth
    frag["bary"] = jnp.stack([vis.b0, vis.b1, vis.b2], axis=-1)
    rgba = fragment_fn(frag, uniforms)
    mask = (vis.tri_id >= 0)[..., None]
    return jnp.where(mask, rgba, background)
