"""Triangle setup: clip-space vertices -> per-triangle raster records.

This is the TPU analog of the fixed-function primitive-assembly /
triangle-setup hardware the reference configures but never implements
(rasterizationState at /root/reference/src/main.cpp:1777-1789: fill mode,
cull mode, front face).  Everything here is vectorized over triangles —
no per-triangle host loops — so it runs as a handful of fused XLA ops on
the VPU ahead of the rasterizer kernel.

Conventions (see ops/fixedpoint.py for the integer spec):
  * input: clip-space positions (T, 3, 4) float32, column-vector convention
    (w > 0 in front of the camera).
  * NDC y is down; viewport maps NDC [-1,1]^2 onto [0,W]x[0,H] pixels.
  * depth = ndc z in [0, 1] (Vulkan-style), later compared as float32.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from . import fixedpoint as fp


class TriSetup(NamedTuple):
    """Struct-of-arrays per-triangle raster record (all leading dim T)."""

    valid: jnp.ndarray  # bool (T,) — survives cull/degenerate/offscreen tests
    xf: jnp.ndarray  # int32 (T, 3) snapped fixed-point x
    yf: jnp.ndarray  # int32 (T, 3) snapped fixed-point y
    a: jnp.ndarray  # int32 (T, 3) edge A coeffs, winding-normalized
    b: jnp.ndarray  # int32 (T, 3) edge B coeffs, winding-normalized
    bias: jnp.ndarray  # int32 (T, 3) fill-rule bias (0 or -1)
    area2_hi: jnp.ndarray  # int32 (T,) |area2| high word
    area2_lo: jnp.ndarray  # int32 (T,) |area2| low word
    inv_area: jnp.ndarray  # f32 (T,) 1 / |area2|
    z: jnp.ndarray  # f32 (T, 3) per-vertex NDC depth
    inv_w: jnp.ndarray  # f32 (T, 3) per-vertex 1/clip_w
    bbox: jnp.ndarray  # int32 (T, 4) pixel bbox x0,y0,x1,y1 (x1/y1 exclusive)
    # Integer quantized-depth plane (spec in ops/fixedpoint.py): per-vertex
    # quantized depth, f32 gradients (LSB per fixed-point unit) for anchor
    # evaluation, and int32 per-pixel gradients (LSB/2^6 per pixel).  Depth
    # is evaluated from canonical 128-px tile anchors so the result is
    # independent of the device path's tiling — that is what makes depth
    # bit-identical between oracle, XLA path, and Pallas kernel.
    zq: jnp.ndarray  # int32 (T, 3) per-vertex quantized depth (24.0 LSB)
    gx: jnp.ndarray  # f32 (T,) depth LSB per +1 fp unit in x
    gy: jnp.ndarray  # f32 (T,)
    dzdx_q: jnp.ndarray  # int32 (T,) depth units (2^(6-zshift) LSB) per px
    dzdy_q: jnp.ndarray  # int32 (T,)
    zshift: jnp.ndarray  # int32 (T,) adaptive exponent of the depth plane


def _i64_to_f32(hi, lo):
    """float32 value of an (hi, lo) emulated int64 — deterministic 2-step.

    Signed-low-word split: v = (hi + (lo < 0)) * 2^32 + int32(lo), so values
    with |v| < 2^31 convert exactly (a plain unsigned split would map e.g.
    -1 to f32(-2^32) + f32(2^32 - 1) == 0 after rounding).
    """
    hi_adj = hi + (lo < 0).astype(jnp.int32)
    return hi_adj.astype(jnp.float32) * jnp.float32(4294967296.0) + lo.astype(jnp.float32)


def setup_triangles(
    clip_pos: jnp.ndarray,
    width: int,
    height: int,
    cull_mode: str = "none",
    front_face: str = "ccw",
    w_eps: float = 1e-6,
    scissor=None,
    bbox_pad_fp: int = 0,
    depth_bias=None,
) -> TriSetup:
    """Vectorized triangle setup.

    Args:
      clip_pos: (T, 3, 4) float32 clip-space positions.
      width, height: framebuffer extent in pixels (static).
      cull_mode: "none" | "back" | "front" (main.cpp:1782 uses eNone).
      front_face: "ccw" | "cw" — winding that counts as front-facing, in
        conventional y-up screen orientation (main.cpp:1783 uses CCW).
      w_eps: triangles with any vertex w <= w_eps are dropped (near-plane
        clipping proper is applied by ops.clip before setup).
      scissor: optional (x0, y0, x1, y1) pixel rect (x1/y1 exclusive);
        bboxes are clamped into it, and rasterizers must also mask
        coverage to it (the dynamic-scissor analog of main.cpp:1764-1775,
        where the reference bakes a full-extent static scissor).
      bbox_pad_fp: widen the pixel bbox by this many subpixel (1/16-px)
        units on every side — fp.MSAA4_BBOX_PAD_FP for coverage-sample
        MSAA, whose sample positions extend up to 6/16 px beyond the
        pixel center (mirrored by the oracle).
      depth_bias: optional static (constant, slope, clamp) — the
        depthBiasEnable rasterization state the reference declares
        disabled (/root/reference/src/main.cpp:1777-1789).  Applied as a
        per-triangle integer offset on the quantized vertex depths:
        o = rint(constant) + rint(slope * m) quantized-LSB units, m the
        triangle's max f32 depth slope per pixel; ``clamp`` (depth units,
        0 = none) bounds o.  Because the edge coefficients of a triangle
        sum to zero exactly, biasing all three vertex depths leaves the
        exact integer depth gradients untouched — the bias flows through
        the plane's base value only, so all proofs hold unchanged.
    """
    x, y, z, w = clip_pos[..., 0], clip_pos[..., 1], clip_pos[..., 2], clip_pos[..., 3]
    w_ok = jnp.all(w > jnp.float32(w_eps), axis=-1)
    safe_w = jnp.where(w > jnp.float32(w_eps), w, jnp.float32(1.0))
    # Deterministic reciprocal: TPU f32 division is not correctly rounded,
    # and inv_w feeds the snapped coordinates (coverage!) and depth.
    inv_w = fp.recip_f32_exact(safe_w)
    ndc_x = x * inv_w
    ndc_y = y * inv_w
    ndc_z = z * inv_w

    # Viewport transform + snap, fused and FMA-proof: the textbook form
    # (ndc*0.5 + 0.5) * extent * 16 is a mul-add chain a compiler may
    # contract, so the spec is xf = rint(ndc_x * 8*width) + 8*width —
    # a single f32 multiplication, then integer arithmetic.  (Static
    # full-framebuffer viewport, the analog of main.cpp:1753-1775.)
    lim = jnp.float32(1 << 30)  # pre-conversion clamp: f32->int32 overflow
    # of huge near-plane-grazing coords would be implementation-defined
    tx = jnp.clip(ndc_x * jnp.float32(8 * width), -lim, lim)
    ty = jnp.clip(ndc_y * jnp.float32(8 * height), -lim, lim)
    xf = jnp.rint(tx).astype(jnp.int32) + jnp.int32(8 * width)
    yf = jnp.rint(ty).astype(jnp.int32) + jnp.int32(8 * height)
    xf = jnp.clip(xf, fp.GUARD_LO, fp.GUARD_HI)
    yf = jnp.clip(yf, fp.GUARD_LO, fp.GUARD_HI)

    a, b, area2 = fp.edge_coeffs(xf, yf)
    area_hi, area_lo = area2
    is_neg = (area_hi < 0) | ((area_hi == 0) & (area_lo < 0))
    is_zero = (area_hi == 0) & (area_lo == 0)

    # Facing: our screen space is y-down, so visually-CCW (y-up) triangles
    # have negative area2 here.
    front_is_negative = front_face == "ccw"
    is_front = is_neg if front_is_negative else (~is_neg & ~is_zero)
    if cull_mode == "none":
        cull_ok = jnp.ones_like(is_zero)
    elif cull_mode == "back":
        cull_ok = is_front
    elif cull_mode == "front":
        cull_ok = ~is_front
    else:  # pragma: no cover - config validation happens in Pipeline
        raise ValueError(f"bad cull_mode {cull_mode!r}")

    # Winding normalization: make area positive, interior = all E >= 0.
    neg = is_neg[..., None]
    a = jnp.where(neg, -a, a)
    b = jnp.where(neg, -b, b)
    abs_hi, abs_lo = fp.i64_neg((area_hi, area_lo))
    area_hi = jnp.where(is_neg, abs_hi, area_hi)
    area_lo = jnp.where(is_neg, abs_lo, area_lo)
    bias = fp.topleft_bias(a, b)

    area_f = _i64_to_f32(area_hi, area_lo)
    inv_area = fp.recip_f32_exact(jnp.where(is_zero, jnp.float32(1.0), area_f))

    # Pixel bbox: conservative cover of the snapped triangle, clamped to the
    # framebuffer (the scissor analog, main.cpp:1764-1775).  A pixel center
    # at px + 0.5 is inside [min, max] iff px*16+8 in [min_fp, max_fp]:
    # first candidate px = ceil((min_fp - 8) / 16), last = floor((max_fp-8)/16).
    min_xf = jnp.min(xf, axis=-1)
    max_xf = jnp.max(xf, axis=-1)
    min_yf = jnp.min(yf, axis=-1)
    max_yf = jnp.max(yf, axis=-1)
    sc = fp.SUBPIXEL_SCALE
    hp = fp.HALF_PIXEL
    pad = int(bbox_pad_fp)
    x0 = jnp.floor_divide(min_xf - pad - hp + (sc - 1), sc)
    y0 = jnp.floor_divide(min_yf - pad - hp + (sc - 1), sc)
    x1 = jnp.floor_divide(max_xf + pad - hp, sc) + 1  # exclusive
    y1 = jnp.floor_divide(max_yf + pad - hp, sc) + 1
    sx0, sy0, sx1, sy1 = (0, 0, width, height) if scissor is None else scissor
    x0 = jnp.clip(x0, sx0, sx1)
    y0 = jnp.clip(y0, sy0, sy1)
    x1 = jnp.clip(x1, sx0, sx1)
    y1 = jnp.clip(y1, sy0, sy1)
    nonempty = (x1 > x0) & (y1 > y0)

    valid = w_ok & cull_ok & ~is_zero & nonempty
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)

    # Integer quantized-depth plane (spec in ops/fixedpoint.py).  Every f32
    # step is a single multiplication so no compiler can contract it; all
    # accumulation is integer.
    zq = jnp.clip(
        jnp.rint(ndc_z * jnp.float32(1 << fp.DEPTH_LSB_BITS)).astype(jnp.int32),
        -fp.DEPTH_VERTEX_CLAMP,
        fp.DEPTH_VERTEX_CLAMP,
    )
    # Plane numerators: exact emulated-64-bit dot of edge coeffs with zq.
    # Weight of v0 <- edge 1, v1 <- edge 2, v2 <- edge 0 (see barycentrics).
    num_x = fp.i64_add(
        fp.i64_add(
            fp.i64_mul_i32(a[..., 1], zq[..., 0]), fp.i64_mul_i32(a[..., 2], zq[..., 1])
        ),
        fp.i64_mul_i32(a[..., 0], zq[..., 2]),
    )
    num_y = fp.i64_add(
        fp.i64_add(
            fp.i64_mul_i32(b[..., 1], zq[..., 0]), fp.i64_mul_i32(b[..., 2], zq[..., 1])
        ),
        fp.i64_mul_i32(b[..., 0], zq[..., 2]),
    )
    gx = _i64_to_f32(*num_x) * inv_area  # depth LSB per +1 fp unit in x
    gy = _i64_to_f32(*num_y) * inv_area
    # Adaptive exponent from the slope's f32 exponent (all exact ops).
    slope = jnp.maximum(jnp.abs(gx), jnp.abs(gy)) * jnp.float32(fp.SUBPIXEL_SCALE)
    eb = (jax.lax.bitcast_convert_type(slope, jnp.int32) >> 23) & jnp.int32(0xFF)
    zshift = jnp.clip(eb - jnp.int32(141), 0, 24)
    unit_scale = jax.lax.bitcast_convert_type(
        (jnp.int32(133) - zshift) << 23, jnp.float32
    )  # f32 2^(6-zshift), exact
    gclamp = jnp.float32(fp.DEPTH_GRAD_CLAMP)
    gx16 = gx * jnp.float32(fp.SUBPIXEL_SCALE)
    gy16 = gy * jnp.float32(fp.SUBPIXEL_SCALE)
    dzdx_q = jnp.rint(jnp.clip(gx16 * unit_scale, -gclamp, gclamp)).astype(jnp.int32)
    dzdy_q = jnp.rint(jnp.clip(gy16 * unit_scale, -gclamp, gclamp)).astype(jnp.int32)

    if depth_bias is not None:
        # Per-triangle bias in quantized-LSB (2^-24 depth) units, added to
        # every vertex depth.  The gradients above were computed from the
        # unbiased depths; adding a common constant would not change them
        # anyway (sum of edge coefficients is exactly zero), so the bias
        # reaches only the plane's base value.  Each term is a single f32
        # multiply + rint (FMA-proof), then pure integer arithmetic —
        # mirrored verbatim by reference/oracle.py.
        bias_c, bias_s, bias_cl = depth_bias
        blim = jnp.float32(1 << 29)
        m_slope = jnp.maximum(jnp.abs(gx16), jnp.abs(gy16))
        o = jnp.rint(jnp.clip(m_slope * jnp.float32(bias_s), -blim, blim)).astype(
            jnp.int32
        ) + jnp.int32(int(round(float(bias_c))))
        if bias_cl > 0:
            o = jnp.minimum(o, jnp.int32(int(round(float(bias_cl) * (1 << fp.DEPTH_LSB_BITS)))))
        elif bias_cl < 0:
            o = jnp.maximum(o, jnp.int32(int(round(float(bias_cl) * (1 << fp.DEPTH_LSB_BITS)))))
        zq = jnp.clip(
            zq + o[:, None], -fp.DEPTH_VERTEX_CLAMP, fp.DEPTH_VERTEX_CLAMP
        )

    return TriSetup(
        valid=valid,
        xf=xf,
        yf=yf,
        a=a,
        b=b,
        bias=bias,
        area2_hi=area_hi,
        area2_lo=area_lo,
        inv_area=inv_area,
        z=ndc_z,
        inv_w=inv_w,
        bbox=bbox,
        zq=zq,
        gx=gx,
        gy=gy,
        dzdx_q=dzdx_q,
        dzdy_q=dzdy_q,
        zshift=zshift,
    )


def depth_tile_anchor(zq0, x0f, y0f, gx, gy, zshift, ax, ay):
    """Quantized plane value (2^(6-zshift) LSB units) at a tile anchor.

    Args:
      zq0: int32 quantized depth of vertex 0; x0f/y0f its fixed-point coords.
      gx, gy: f32 depth gradients (LSB per fp unit).
      zshift: int32 per-triangle adaptive exponent.
      ax, ay: anchor pixel indices (multiples of fp.DEPTH_TILE).
    All array args broadcast together.  Returns clamped int32.
    """
    ax_fp, ay_fp = fp.pixel_center_fp(ax, ay)
    unit_scale = jax.lax.bitcast_convert_type(
        (jnp.int32(133) - zshift) << 23, jnp.float32
    )  # 2^(6-zshift)
    lim = jnp.float32(1 << 30)
    dxf = (ax_fp - x0f).astype(jnp.float32)
    dyf = (ay_fp - y0f).astype(jnp.float32)
    tx = jnp.rint(jnp.clip(gx * dxf * unit_scale, -lim, lim)).astype(jnp.int32)
    ty = jnp.rint(jnp.clip(gy * dyf * unit_scale, -lim, lim)).astype(jnp.int32)
    # base = (zq0 >> max(0, s-6)) * 2^max(0, 6-s) - mid_u, exact in i64.
    rsh = jnp.clip(zshift - fp.DEPTH_FRAC_BITS, 0, 24)
    pow_l = jnp.left_shift(jnp.int32(1), jnp.clip(fp.DEPTH_FRAC_BITS - zshift, 0, 6))
    base32 = jnp.right_shift(zq0, rsh)
    mid_u = jnp.right_shift(jnp.int32(1 << 29), zshift)
    base = fp.i64_mul_i32(base32, pow_l)
    base = fp.i64_add(base, fp.i64_from_i32(-mid_u))
    s = fp.i64_add(fp.i64_add(base, fp.i64_from_i32(tx)), fp.i64_from_i32(ty))
    # Clamp with headroom: only planes fully out of range in this tile can
    # clamp (value-exactness proof in ops/fixedpoint.py).
    clamp_hi = mid_u + jnp.int32(1 << 29)
    return jnp.clip(fp.i64_clamp_to_i32(s, -(1 << 30), 1 << 30), -clamp_hi, clamp_hi)


def depth_at_pixel(z_tile, dzdx_q, dzdy_q, zshift, dx, dy):
    """Per-pixel quantized depth: int32-exact step from the tile anchor,
    then unbias/rescale to global LSB*2^6 units.

    dx, dy are pixel offsets from the canonical tile anchor (< 128).
    Out-of-range planes land strictly outside [0, 2^30] so depth clip
    discards them.
    """
    z_u = z_tile + dzdx_q * dx + dzdy_q * dy
    hi = jnp.right_shift(jnp.int32(1 << 29), zshift) + jnp.int32(1)
    return jnp.left_shift(jnp.clip(z_u, -hi, hi), zshift) + jnp.int32(1 << 29)
