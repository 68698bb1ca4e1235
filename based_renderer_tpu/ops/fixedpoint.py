"""Fixed-point rasterization arithmetic spec.

This module is the *numerical contract* of the rasterizer.  Coverage must be
bit-identical between the CPU oracle (``based_renderer_tpu.reference``), the
pure-XLA rasterizer, and the Pallas TPU kernel, so every path evaluates edge
functions over the same snapped integer grid with the same exact-arithmetic
scheme.  (The reference delegates all of this to the GPU's fixed-function
rasterizer, which it merely configures at /root/reference/src/main.cpp:1777-1827;
on TPU we own the fill rules.)

Spec
----
* Screen space: x right, y down, pixel centers at (px + 0.5, py + 0.5).
* Vertex positions are snapped to ``SUBPIXEL_BITS`` = 4 fractional bits
  (1/16 pixel grid) and clamped to a +/-``GUARD_BAND_PIX`` = 8192 px guard
  band.  All snapped coords fit in 18 signed bits.
* Edge function for edge i (from v_i to v_j, j = (i+1) mod 3):
      E_i(p) = (x_j - x_i) * (p.y - y_i) - (y_j - y_i) * (p.x - x_i)
  evaluated at pixel centers ``p = (px * 16 + 8, py * 16 + 8)``.
* Winding is normalised: if twice-signed-area (= sum of E_i at any point)
  is negative, all edge functions are negated, so interior is E_i >= 0.
* Fill rule (shared-edge tie-break): boundary pixels (E_i == 0) are covered
  iff the edge direction d = v_j - v_i satisfies
      (d.y > 0) or (d.y == 0 and d.x < 0)
  implemented as an integer bias: covered iff E_i + bias_i >= 0 with
  bias_i = 0 for included directions else -1.
* Exactness: E at an arbitrary point needs ~40 bits.  Device paths evaluate
  E exactly at a *tile anchor* using emulated 64-bit integer math (pairs of
  int32), clamp the anchor value to +/-(2^30 - 1), and step per-pixel in
  int32.  With |A|,|B| < 2^18 (guard band) and in-tile deltas < 2^11 fixed
  units (tile <= 128 px), |A*dx + B*dy| <= 2 * 2^18 * 2040 < 2^30, so the
  clamped sum never overflows int32 and never changes the sign class
  (>0 / ==0 / <0) of any in-tile pixel.  Coverage is therefore *provably*
  identical to exact arithmetic.

All functions here are shape-polymorphic jnp code usable from the CPU oracle
tests, the XLA rasterizer, and (the int32 parts) inside Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SUBPIXEL_BITS = 4
SUBPIXEL_SCALE = 1 << SUBPIXEL_BITS  # 16
HALF_PIXEL = SUBPIXEL_SCALE // 2  # 8: offset of a pixel center on the snap grid
GUARD_BAND_PIX = 8192
GUARD_LO = -GUARD_BAND_PIX * SUBPIXEL_SCALE  # -2^17
GUARD_HI = GUARD_BAND_PIX * SUBPIXEL_SCALE - 1
ANCHOR_CLAMP = (1 << 30) - 1  # tile-anchor clamp window (see module docstring)
MAX_TILE_PIX = 128  # largest tile for which the int32 stepping proof holds

# ---------------------------------------------------------------------------
# MSAA-4x sample positions (the Vulkan/D3D standard 4x pattern — rotated
# grid), in 1/16-px subpixel units within the pixel: (6,2) (14,6) (2,10)
# (10,14), i.e. (0.375,0.125) (0.875,0.375) (0.125,0.625) (0.625,0.875).
# Stored as offsets from the pixel CENTER (8,8), so per-sample edge and
# depth values derive from the pixel-center records by pure stepping.
#
# Proof extension (coverage): in-tile pixel-center deltas are dx,dy <=
# 127*16 = 2032 subpixel units; with the sample offsets (|ddx|,|ddy| <= 6)
#   |A*(dx+ddx) + B*(dy+ddy)| <= 2*(2^18-1)*2038 = 1,068,494,868 < 2^30-1
# so the clamped-anchor sign-class argument still holds, and
# (2^30-1) + 1,068,494,868 = 2,142,236,691 < 2^31-1 rules out overflow.
#
# Proof extension (depth): per-sample depth is DEFINED as
#   z_u_s = z_u + ((dzdx_q*ddx + dzdy_q*ddy) >> 4)        (arithmetic shift)
# with |dz_s| <= (2*6*(2^21-1)) >> 4 = 1,572,863, so the in-tile variation
# bound becomes V' = 2*(2^21-1)*127 + 1,572,863 = 534,249,217 < 2^29 and
# the value-exactness proof in the depth spec below goes through unchanged.
# ---------------------------------------------------------------------------
MSAA4_OFFSETS = ((-2, -6), (6, -2), (-6, 2), (2, 6))  # (ddx, ddy) from center
MSAA4_BBOX_PAD_FP = 6  # bbox widening (subpixel units): max |offset| above

# ---------------------------------------------------------------------------
# Integer depth spec (D24-style, like the reference's D24S8 depth image at
# /root/reference/src/main.cpp:1472-1484).
#
# Float mul+add chains are not deterministic across compilers (XLA freely
# contracts them into FMAs), so interpolated depth is defined as an *integer*
# quantized-plane evaluation with a per-triangle adaptive exponent:
#
#   zq_i   = clamp(rint(z_ndc_i * 2^24), +/-2^29)               per vertex
#   gx     = f32(A1*zq0 + A2*zq1 + A0*zq2) * inv_area           (LSB/fp-unit)
#   gy     = likewise with B
#   slope  = max(|gx|, |gy|) * 16                               (LSB/pixel)
#   s      = clamp(biased_exp(slope) - 141, 0, 24)   ("zshift"; chosen so
#            slope * 2^(6-s) < 2^21 — steep, near-edge-on planes trade
#            fractional depth bits for range instead of corrupting)
#   units  = 2^(6-s) LSB, values stored *biased* by -mid_u, mid_u = 2^29>>s
#            (the depth midpoint), so the valid window is symmetric
#   dzdx_q = clamp(rint((gx*16) * 2^(6-s)), +/-(2^21-1))        int32/units
#   dzdy_q = likewise
#   at a canonical 128-px tile anchor (ax, ay) = 128-grid pixel center:
#   base   = (zq0 >> max(0, s-6)) * 2^max(0, 6-s) - mid_u       exact
#   z_tile = clamp64(base + R(gx * f32(ax_fp-x0_fp) * 2^(6-s))
#                         + R(gy * f32(ay_fp-y0_fp) * 2^(6-s)),
#                    +/-(mid_u + 2^29))
#   per pixel (dx, dy = offsets from the tile anchor, < 128):
#   z_u    = z_tile + dzdx_q*dx + dzdy_q*dy                     int32, exact
#   z_q    = (clamp(z_u, +/-(mid_u + 1)) << s) + 2^29           (unbias)
#
# where R(v) = rint(clamp(v, +/-2^30)) and every f32 step is a single
# multiplication (FMA-proof; multiplies by powers of two are exact).
# Depth compares/stores operate on z_q; the value 1.0 is DEPTH_ONE_Q =
# 2^30, and fragments with z_q outside [0, 2^30] are depth-clipped.
#
# Value-exactness proof (stronger than the edge functions' sign-class
# proof, since depth needs exact magnitudes): in-tile variation
# V = |dzdx_q*dx + dzdy_q*dy| <= 2*(2^21-1)*127 < 2^29.  If the plane is
# inside the valid window [0, 2^30] (biased: [-mid_u, +mid_u]) at ANY
# in-tile pixel, the anchor lies within mid_u + V < the clamp bound, so
# the anchor is NOT clamped and every in-tile value is exact.  If the
# anchor IS clamped, every in-tile pixel is >= clampbound - V >
# mid_u + 1 outside the window, so all its fragments are depth-clipped
# either way.  Ranges: |z_tile| <= mid_u + 2^29 <= 2^30, |z_u| <=
# 2^30 + 2^29 < 2^31, |z_q| <= 2^29 + 2^s + 2^29 < 2^31.
# ---------------------------------------------------------------------------
DEPTH_LSB_BITS = 24
DEPTH_FRAC_BITS = 6
DEPTH_ONE_Q = 1 << (DEPTH_LSB_BITS + DEPTH_FRAC_BITS)  # == 2^30 == depth 1.0
DEPTH_VERTEX_CLAMP = 1 << 29  # clamp on per-vertex quantized z
DEPTH_GRAD_CLAMP = (1 << 21) - 1
DEPTH_TILE = 128  # canonical anchor grid for quantized-plane evaluation
DEPTH_Q_TO_F32 = 1.0 / DEPTH_ONE_Q


def snap_fixed(coord_f32: jnp.ndarray) -> jnp.ndarray:
    """Snap float screen coords (in pixels) to the 1/16-px integer grid.

    Round-half-away-from-zero via floor(x * 16 + 0.5) on the non-negative
    branch; we use rint (round-half-even) — the choice only needs to be
    consistent across oracle and device, and jnp.rint / np.rint agree.
    """
    scaled = coord_f32 * jnp.float32(SUBPIXEL_SCALE)
    snapped = jnp.rint(scaled).astype(jnp.int32)
    return jnp.clip(snapped, GUARD_LO, GUARD_HI)


def recip_f32_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic, exactly-specified f32 reciprocal of positive normals.

    TPU f32 division is not IEEE-correctly-rounded (measured: 1-2 ulp
    variance vs numpy), so every reciprocal feeding the bit-identity
    contract is *defined* by this algorithm instead of by 1.0/x:

        x = mw * 2^(e-150)  with mw in [2^23, 2^24), e = biased exponent
        q = floor(2^47 / mw)            (exact integer, in [2^23, 2^24])
        recip(x) := f32(q) * 2^(103-e)  (both factors exact in f32)

    The hardware division only *seeds* q; an exact integer fixup (emulated
    64-bit compare of q*mw against 2^47) makes the result independent of
    the seed's rounding.  Relative error <= 2^-23 (truncation), which is
    accuracy-grade, and bit-identical on every backend.  The CPU oracle
    computes floor(2^47/mw) directly with big integers.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = (bits >> 23) & jnp.int32(0xFF)
    mw = (bits & jnp.int32(0x7FFFFF)) | jnp.int32(0x800000)
    q = jnp.rint(jnp.float32(2.0**47) / mw.astype(jnp.float32)).astype(jnp.int32)
    # Newton-style correction in case the seed is several ulp off, then an
    # exact +-2 fixup.  TWO47 as an (hi, lo) pair is (2^15, 0).
    two47 = (jnp.full_like(q, 1 << 15), jnp.zeros_like(q))
    err = i64_add(i64_mul_i32(q, mw), i64_neg(two47))  # q*mw - 2^47
    err_f = (err[0] + (err[1] < 0).astype(jnp.int32)).astype(jnp.float32) * jnp.float32(
        4294967296.0
    ) + err[1].astype(jnp.float32)
    q = q - jnp.rint(err_f / mw.astype(jnp.float32)).astype(jnp.int32)
    for _ in range(2):
        too_big = i64_cmp_lt(two47, i64_mul_i32(q, mw))  # q*mw > 2^47
        q = q - too_big.astype(jnp.int32)
    for _ in range(2):
        nxt = i64_mul_i32(q + 1, mw)
        ok = ~i64_cmp_lt(two47, nxt)  # (q+1)*mw <= 2^47
        q = q + ok.astype(jnp.int32)
    exp_s = jnp.clip(jnp.int32(230) - e, 1, 254)
    scale = jax.lax.bitcast_convert_type(exp_s << 23, jnp.float32)
    return q.astype(jnp.float32) * scale


# ---------------------------------------------------------------------------
# Emulated 64-bit signed integer arithmetic on int32 pairs.
#
# Representation: value = hi * 2^32 + (lo interpreted as uint32), both stored
# as int32 (lo's bit pattern reinterpreted).  Only the handful of ops the
# edge-setup path needs.  Runs everywhere jnp runs, including Pallas.
# ---------------------------------------------------------------------------


def _u32(x):
    return x.astype(jnp.uint32)


def i64_from_i32(a):
    """Widen int32 -> (hi, lo)."""
    lo = a
    hi = jnp.where(a < 0, jnp.int32(-1), jnp.int32(0))
    return hi, lo


def i64_add(a, b):
    """(hi,lo) + (hi,lo) with carry."""
    ahi, alo = a
    bhi, blo = b
    lo_u = _u32(alo) + _u32(blo)
    carry = (lo_u < _u32(alo)).astype(jnp.int32)
    hi = ahi + bhi + carry
    return hi, lo_u.astype(jnp.int32)


def i64_neg(a):
    ahi, alo = a
    lo_u = (~_u32(alo)) + jnp.uint32(1)
    borrow = (lo_u == 0).astype(jnp.int32)
    hi = (~ahi) + borrow
    return hi, lo_u.astype(jnp.int32)


def i64_mul_i32(a, b):
    """Exact int32 x int32 -> (hi, lo) via 16-bit limb products."""
    a_u = _u32(a)
    b_u = _u32(b)
    a_lo = a_u & jnp.uint32(0xFFFF)
    a_hi = a_u >> 16
    b_lo = b_u & jnp.uint32(0xFFFF)
    b_hi = b_u >> 16
    ll = a_lo * b_lo  # < 2^32, exact in uint32
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # unsigned 64-bit product = ll + (lh + hl) << 16 + hh << 32
    mid = lh + (hl & jnp.uint32(0xFFFFFFFF))  # may carry into bit 32
    mid_carry = (mid < lh).astype(jnp.uint32)  # carry out of the 32-bit mid sum
    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(jnp.uint32)
    hi_u = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    # signed correction: for negative a, subtract b << 32; for negative b,
    # subtract a << 32 (two's-complement multiply identity).
    hi_u = hi_u - jnp.where(a < 0, b_u, jnp.uint32(0))
    hi_u = hi_u - jnp.where(b < 0, a_u, jnp.uint32(0))
    return hi_u.astype(jnp.int32), lo.astype(jnp.int32)


def i64_clamp_to_i32(a, lo_clamp: int, hi_clamp: int):
    """Clamp a (hi, lo) value into [lo_clamp, hi_clamp] (int32 constants)."""
    hi, lo = a
    # Value fits in int32 iff hi == sign-extension of lo.
    fits = hi == jnp.where(lo < 0, jnp.int32(-1), jnp.int32(0))
    big_pos = (hi > 0) | ((hi == 0) & (lo < 0))
    small = jnp.where(fits, lo, jnp.where(big_pos, jnp.int32(hi_clamp), jnp.int32(lo_clamp)))
    return jnp.clip(small, lo_clamp, hi_clamp)


def i64_cmp_lt(a, b):
    """a < b for (hi, lo) pairs."""
    ahi, alo = a
    bhi, blo = b
    return (ahi < bhi) | ((ahi == bhi) & (_u32(alo) < _u32(blo)))


# ---------------------------------------------------------------------------
# Edge setup (exact, emulated 64-bit) — vectorized over triangles.
# ---------------------------------------------------------------------------


def edge_coeffs(xf, yf):
    """Per-triangle edge coefficients from snapped coords.

    Args:
      xf, yf: int32 arrays (..., 3) of snapped fixed-point vertex coords.
    Returns:
      A, B: int32 (..., 3) with E_i(p) = A_i * p.x + B_i * p.y + C_i where
        A_i = -(y_j - y_i) = y_i - y_j,  B_i = x_j - x_i  (j = i+1 mod 3),
      area2: exact twice-signed-area as an i64 pair ((...,), (...,)).
    """
    xj = jnp.roll(xf, -1, axis=-1)
    yj = jnp.roll(yf, -1, axis=-1)
    a = yf - yj
    b = xj - xf
    # area2 = cross(v1 - v0, v2 - v0), exact.
    d1x = xf[..., 1] - xf[..., 0]
    d1y = yf[..., 1] - yf[..., 0]
    d2x = xf[..., 2] - xf[..., 0]
    d2y = yf[..., 2] - yf[..., 0]
    t0 = i64_mul_i32(d1x, d2y)
    t1 = i64_mul_i32(d1y, d2x)
    area2 = i64_add(t0, i64_neg(t1))
    return a, b, area2


def edge_at_point_exact(xf, yf, a, b, px_fp, py_fp):
    """Exact E_i at a fixed-point point, as an i64 pair.

    E_i(p) = A_i * (p.x - x_i) + B_i * (p.y - y_i); (p - v_i) may span the
    full guard band, so the products need ~40 bits.
    """
    dx = px_fp - xf
    dy = py_fp - yf
    return i64_add(i64_mul_i32(a, dx), i64_mul_i32(b, dy))


def topleft_bias(a, b):
    """Fill-rule bias per edge: 0 if boundary included, -1 otherwise.

    Included directions d = v_j - v_i: (d.y > 0) or (d.y == 0 and d.x < 0).
    In terms of coefficients A = -d.y, B = d.x: included iff
    (A < 0) or (A == 0 and B < 0).
    """
    included = (a < 0) | ((a == 0) & (b < 0))
    return jnp.where(included, jnp.int32(0), jnp.int32(-1))


def pixel_center_fp(px: jnp.ndarray, py: jnp.ndarray):
    """Pixel indices -> fixed-point pixel-center coordinates."""
    x = px.astype(jnp.int32) * SUBPIXEL_SCALE + HALF_PIXEL
    y = py.astype(jnp.int32) * SUBPIXEL_SCALE + HALF_PIXEL
    return x, y
