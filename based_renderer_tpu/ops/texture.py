"""Texture sampling on the VPU (the fixed-function sampler analog).

The reference has no textures (its shaders return constant color,
src/cube.slang:63-67); BASELINE config 3 requires bilinear sampling, so
this is net-new capability.  Textures are (H, W, C) float32 arrays in HBM;
sampling is vectorized gathers over the whole framebuffer's UV field.

Two tiers:
  * raw-array samplers (sample_nearest / sample_bilinear) — build the
    2x2-neighborhood patch on the fly;
  * scene.Texture samplers (sample_texture / sample_trilinear) — use the
    patch rows prebuilt at upload (one flat gather per tap) and the
    box-filtered mip chain, with the LOD selected from screen-space UV
    derivatives (lod_from_uv).  Per-level extents/offsets are static
    Python values selected with a short jnp.where chain — never a
    per-pixel table lookup, which is pathologically slow on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wrap_coord(c: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    if mode == "repeat":
        return jnp.mod(c, size)
    if mode == "clamp":
        return jnp.clip(c, 0, size - 1)
    if mode == "mirror":
        period = 2 * size
        m = jnp.mod(c, period)
        return jnp.where(m >= size, period - 1 - m, m)
    raise ValueError(f"bad wrap mode {mode!r}")


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray, wrap: str = "repeat") -> jnp.ndarray:
    """Nearest-neighbor sample.  uv: (..., 2) in [0,1] texture space
    (u right, v down, matching the framework's y-down screen space)."""
    th, tw = tex.shape[0], tex.shape[1]
    x = jnp.floor(uv[..., 0] * tw).astype(jnp.int32)
    y = jnp.floor(uv[..., 1] * th).astype(jnp.int32)
    x = _wrap_coord(x, tw, wrap)
    y = _wrap_coord(y, th, wrap)
    # Flat single-index gather: ~2.5x faster than 2D fancy indexing on TPU.
    return tex.reshape(th * tw, -1)[y * tw + x]


def _shift_clamped(tex, axis):
    """tex shifted by -1 along axis with edge-clamp semantics."""
    sl = [slice(None)] * tex.ndim
    sl[axis] = slice(1, None)
    last = [slice(None)] * tex.ndim
    last[axis] = slice(-1, None)
    return jnp.concatenate([tex[tuple(sl)], tex[tuple(last)]], axis=axis)


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray, wrap: str = "repeat") -> jnp.ndarray:
    """Bilinear sample with texel centers at (i + 0.5) / size.

    TPUs have no gather unit, so gathers dominate sampling cost (measured
    ~13 ms per 2D fancy-index gather of a 1080p UV field).  The fast path
    packs each texel's 2x2 neighborhood into one row so a full bilinear
    tap is a SINGLE flat gather (~5 ms) instead of four 2D ones (~53 ms).
    """
    th, tw = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * tw - 0.5
    fy = uv[..., 1] * th - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0.astype(jnp.float32))[..., None]
    ay = (fy - y0.astype(jnp.float32))[..., None]
    x0w = _wrap_coord(x0, tw, wrap)
    y0w = _wrap_coord(y0, th, wrap)

    if wrap == "clamp":
        # Below the low edge both taps clamp to texel 0, but the packed
        # patch's +1 neighbor is texel 1 — neutralize the blend there.
        ax = jnp.where((x0 < 0)[..., None], 0.0, ax)
        ay = jnp.where((y0 < 0)[..., None], 0.0, ay)
    if wrap in ("repeat", "clamp"):
        if wrap == "repeat":
            tx1 = jnp.roll(tex, -1, axis=1)
            ty1 = jnp.roll(tex, -1, axis=0)
            txy = jnp.roll(tx1, -1, axis=0)
        else:
            tx1 = _shift_clamped(tex, 1)
            ty1 = _shift_clamped(tex, 0)
            txy = _shift_clamped(tx1, 0)
        c = tex.shape[-1]
        patch = jnp.concatenate([tex, tx1, ty1, txy], axis=-1).reshape(th * tw, 4 * c)
        p = patch[y0w * tw + x0w]  # ONE flat gather
        t00, t01, t10, t11 = (
            p[..., :c],
            p[..., c : 2 * c],
            p[..., 2 * c : 3 * c],
            p[..., 3 * c :],
        )
    else:  # mirror: fall back to four flat gathers
        flat = tex.reshape(th * tw, -1)
        x1w = _wrap_coord(x0 + 1, tw, wrap)
        y1w = _wrap_coord(y0 + 1, th, wrap)
        t00 = flat[y0w * tw + x0w]
        t01 = flat[y0w * tw + x1w]
        t10 = flat[y1w * tw + x0w]
        t11 = flat[y1w * tw + x1w]
    top = t00 * (1.0 - ax) + t01 * ax
    bot = t10 * (1.0 - ax) + t11 * ax
    return top * (1.0 - ay) + bot * ay


# ---------------------------------------------------------------------------
# scene.Texture samplers (prebuilt patch rows + mip chain)
# ---------------------------------------------------------------------------


def _select_by_level(lvl, values):
    """Per-pixel select from a short static list (no table gather)."""
    out = jnp.full(lvl.shape, jnp.int32(values[0]))
    for i, v in enumerate(values[1:], start=1):
        out = jnp.where(lvl == i, jnp.int32(v), out)
    return out


def _sample_packed_level(tex, uv, lvl):
    """Bilinear tap from the packed patch rows at per-pixel mip level.

    tex: scene.Texture; uv: (..., 2); lvl: (...) int32 in [0, L).
    One flat gather total.
    """
    wrap, c, sizes = tex.meta[:3]
    offs = [0]
    for h, w in sizes:
        offs.append(offs[-1] + h * w)
    w_v = _select_by_level(lvl, [w for _h, w in sizes]).astype(jnp.float32)
    h_v = _select_by_level(lvl, [h for h, _w in sizes]).astype(jnp.float32)
    off_v = _select_by_level(lvl, offs[:-1])

    fx = uv[..., 0] * w_v - 0.5
    fy = uv[..., 1] * h_v - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0.astype(jnp.float32))[..., None]
    ay = (fy - y0.astype(jnp.float32))[..., None]
    wi = w_v.astype(jnp.int32)
    hi = h_v.astype(jnp.int32)
    pow2 = all(h & (h - 1) == 0 and w & (w - 1) == 0 for h, w in sizes)
    if wrap == "repeat" and pow2:
        # Integer mod with a per-pixel RUNTIME divisor has no strength
        # reduction on TPU and dominates the tap; all mip extents are
        # powers of two, so two's-complement AND is the exact mod.
        x0w = x0 & (wi - 1)
        y0w = y0 & (hi - 1)
    elif wrap == "repeat":
        x0w = jnp.mod(x0, wi)
        y0w = jnp.mod(y0, hi)
    else:  # clamp
        x0w = jnp.clip(x0, 0, wi - 1)
        y0w = jnp.clip(y0, 0, hi - 1)
        # Below the low edge both taps clamp to texel 0, but the packed
        # patch's +1 neighbor is texel 1 — neutralize the blend there.
        ax = jnp.where((x0 < 0)[..., None], 0.0, ax)
        ay = jnp.where((y0 < 0)[..., None], 0.0, ay)
    p = tex.packed[off_v + y0w * wi + x0w]  # ONE flat gather
    t00 = p[..., :c]
    t01 = p[..., c : 2 * c]
    t10 = p[..., 2 * c : 3 * c]
    t11 = p[..., 3 * c :]
    top = t00 * (1.0 - ax) + t01 * ax
    bot = t10 * (1.0 - ax) + t11 * ax
    return top * (1.0 - ay) + bot * ay


def lod_from_uv(uv, tex_h: int, tex_w: int):
    """Mip LOD from screen-space finite differences of the UV field.

    uv: (H, W, 2) interpolated texture coordinates.  The GPU analog is
    the 2x2-quad derivative; here the whole field exists, so forward
    differences (with the last row/column clamped) serve.  Object edges
    inherit their neighbor's LOD — the same artifact quad derivatives
    have.
    """
    du_dx = jnp.diff(uv, axis=1, append=uv[:, -1:])
    du_dy = jnp.diff(uv, axis=0, append=uv[-1:])
    scale = jnp.asarray([tex_w, tex_h], jnp.float32)
    rho = jnp.maximum(
        jnp.max(jnp.abs(du_dx) * scale, axis=-1),
        jnp.max(jnp.abs(du_dy) * scale, axis=-1),
    )
    return jnp.log2(jnp.maximum(rho, jnp.float32(1e-12)))


def sample_texture(tex, uv, lod=None):
    """Sample a scene.Texture honoring its sampler state: bilinear
    (single level), nearest-mip (one tap at the rounded LOD — the
    default: a full-screen tap is one flat gather and "linear" doubles
    it), or trilinear.  Accepts raw arrays for back-compat."""
    if not hasattr(tex, "meta"):  # raw (H, W, C) array
        return sample_bilinear(tex, uv)
    num_levels = len(tex.meta[2])
    if num_levels == 1 or lod is None:
        return _sample_packed_level(tex, uv, jnp.zeros(uv.shape[:-1], jnp.int32))
    mip_filter = tex.meta[3] if len(tex.meta) > 3 else "nearest"
    if mip_filter == "nearest":
        lvl = jnp.clip(
            jnp.round(lod).astype(jnp.int32), 0, num_levels - 1
        )
        return _sample_packed_level(tex, uv, lvl)
    return sample_trilinear(tex, uv, lod)


def sample_trilinear(tex, uv, lod):
    """Trilinear mip sample: bilinear taps at floor/ceil levels, lerped.

    Two flat gathers total.  lod: (...) float32 (lod_from_uv).
    """
    num_levels = len(tex.meta[2])
    lodc = jnp.clip(lod, 0.0, float(num_levels - 1))
    l0 = jnp.floor(lodc).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    frac = (lodc - l0.astype(jnp.float32))[..., None]
    s0 = _sample_packed_level(tex, uv, l0)
    s1 = _sample_packed_level(tex, uv, l1)
    return s0 * (1.0 - frac) + s1 * frac


def _sep_level_static(tex, u_row, v_col, level: int):
    """Separable bilinear tap at a STATIC mip level via one-hot matmuls.

    Fetches every pixel's 2x2 patch row with a row-select matmul
    (onehot_y @ packed_level) followed by a column-select contraction
    (contract the texel-x axis against onehot_x) — both exact: one-hot
    f32 matmuls under Precision.HIGHEST reconstruct the operand
    bit-exactly (bf16x3 decomposition re-sums exactly; CLAUDE.md,
    verified on v5e).  The blend weights and lerp expressions mirror
    _sample_packed_level, so for identical (u, v) inputs the result
    matches the gather path to within FMA contraction of the same
    mul-add chains (<= 1-2 ulp; XLA contracts per program — tests pin
    the fetch exactly at texel centers and the blend at 2 ulp).
    """
    wrap, c, sizes = tex.meta[:3]
    th, tw = sizes[level]
    off = 0
    for h, w in sizes[:level]:
        off += h * w
    slab = tex.packed[off : off + th * tw].reshape(th, tw * 4 * c)
    fx = u_row * jnp.float32(tw) - 0.5
    fy = v_col * jnp.float32(th) - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0.astype(jnp.float32))[None, :, None]  # (1, W, 1)
    ay = (fy - y0.astype(jnp.float32))[:, None, None]  # (H, 1, 1)
    pow2 = all(h & (h - 1) == 0 and w & (w - 1) == 0 for h, w in sizes)
    if wrap == "repeat" and pow2:
        x0w = x0 & (tw - 1)
        y0w = y0 & (th - 1)
    elif wrap == "repeat":
        x0w = jnp.mod(x0, tw)
        y0w = jnp.mod(y0, th)
    else:  # clamp — the packed +1 neighbor is texel 1 below the low edge
        x0w = jnp.clip(x0, 0, tw - 1)
        y0w = jnp.clip(y0, 0, th - 1)
        ax = jnp.where((x0 < 0)[None, :, None], 0.0, ax)
        ay = jnp.where((y0 < 0)[:, None, None], 0.0, ay)
    hp = jax.lax.Precision.HIGHEST
    onehot_y = (y0w[:, None] == jnp.arange(th, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )
    onehot_x = (x0w[:, None] == jnp.arange(tw, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )
    rows = jax.lax.dot_general(
        onehot_y, slab, (((1,), (0,)), ((), ())), precision=hp
    ).reshape(v_col.shape[0], tw, 4 * c)
    p = jnp.einsum("htc,wt->hwc", rows, onehot_x, precision=hp)
    t00 = p[..., :c]
    t01 = p[..., c : 2 * c]
    t10 = p[..., 2 * c : 3 * c]
    t11 = p[..., 3 * c :]
    top = t00 * (1.0 - ax) + t01 * ax
    bot = t10 * (1.0 - ax) + t11 * ax
    return top * (1.0 - ay) + bot * ay


def sample_separable(tex, u_row, v_col, lod=None):
    """Separable resampling on the MXU for screen-axis-aligned UV fields.

    When a draw's texture coordinates are an axis-aligned affine function
    of screen position — u depends only on pixel x, v only on pixel y
    (full-screen quads, blits, sprites, skies) — the per-pixel tap
    factors into a row select and a column select, which run as one-hot
    matmuls on the MXU instead of the flat gather (TPUs have no gather
    unit; a full-screen gather tap costs ~10 ms at 1080p, the matmuls
    ~1 ms).  Sampling semantics (wrap, texel centers, mip dispatch)
    mirror sample_texture with a CONSTANT LOD: for an affine mapping the
    UV derivative is constant, so the scalar LOD is the analytically
    correct one (the per-pixel gather path differs only at the last
    row/column, where its clamped forward differences bend).

    tex: scene.Texture; u_row: (W,) f32; v_col: (H,) f32; lod: traced
    scalar f32 or None.  Returns (H, W, C).
    """
    if not hasattr(tex, "meta"):
        raise ValueError("sample_separable requires a scene.Texture")
    num_levels = len(tex.meta[2])
    if num_levels == 1 or lod is None:
        return _sep_level_static(tex, u_row, v_col, 0)
    branches = [
        (lambda l: (lambda: _sep_level_static(tex, u_row, v_col, l)))(l)
        for l in range(num_levels)
    ]
    mip_filter = tex.meta[3] if len(tex.meta) > 3 else "nearest"
    if mip_filter == "nearest":
        lvl = jnp.clip(jnp.round(lod).astype(jnp.int32), 0, num_levels - 1)
        return jax.lax.switch(lvl, branches)
    lodc = jnp.clip(lod, 0.0, float(num_levels - 1))
    l0 = jnp.floor(lodc).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    frac = (lodc - l0.astype(jnp.float32))[..., None]
    s0 = jax.lax.switch(l0, branches)
    s1 = jax.lax.switch(l1, branches)
    return s0 * (1.0 - frac) + s1 * frac


def sample_anisotropic(tex, uv, max_aniso: int = 4):
    """Anisotropic filtering (VkSamplerCreateInfo.maxAnisotropy analog).

    uv must be a full (H, W, 2) screen-space field (the footprint axes
    come from its finite differences, like lod_from_uv).  Takes
    ``max_aniso`` bilinear taps spaced along the major footprint axis at
    the LOD of the *minor* axis, box-averaged — the standard software
    approximation of EWA.  Cost is max_aniso flat gathers (each ~10 ms
    for a full 1080p field on v5e), so this is an opt-in quality tier;
    mipmapped `scene.Texture` required.

    max_aniso=1 degenerates to a single nearest-mip tap.
    """
    if max_aniso < 1:
        raise ValueError("max_aniso must be >= 1")
    num_levels = len(tex.meta[2])
    th, tw = tex.meta[2][0]
    scale = jnp.asarray([tw, th], jnp.float32)
    du_dx = jnp.diff(uv, axis=1, append=uv[:, -1:]) * scale
    du_dy = jnp.diff(uv, axis=0, append=uv[-1:]) * scale
    lx = jnp.sqrt(jnp.sum(du_dx * du_dx, axis=-1))
    ly = jnp.sqrt(jnp.sum(du_dy * du_dy, axis=-1))
    major_is_x = lx >= ly
    rho_maj = jnp.maximum(jnp.maximum(lx, ly), 1e-12)
    rho_min = jnp.maximum(jnp.minimum(lx, ly), 1e-12)
    # Number of taps the footprint wants, capped by the sampler state;
    # the LOD comes from the footprint divided across the taps.
    n = jnp.clip(jnp.ceil(rho_maj / rho_min), 1.0, float(max_aniso))
    lod = jnp.log2(jnp.maximum(rho_maj / n, 1e-12))
    lvl = jnp.clip(jnp.round(lod).astype(jnp.int32), 0, num_levels - 1)
    # Major-axis step in uv units.
    axis = jnp.where(major_is_x[..., None], du_dx, du_dy) / scale
    acc = None
    wsum = None
    for i in range(max_aniso):
        # Tap positions (i + 0.5)/n - 0.5 along the axis; taps beyond the
        # per-pixel count fold onto the last valid position with zero
        # weight (static unroll, per-pixel n).
        t = (jnp.float32(i) + 0.5) / n - 0.5
        w = (jnp.float32(i) < n).astype(jnp.float32)
        s = _sample_packed_level(tex, uv + (t * w)[..., None] * axis, lvl)
        acc = s * w[..., None] if acc is None else acc + s * w[..., None]
        wsum = w if wsum is None else wsum + w
    return acc / wsum[..., None]
