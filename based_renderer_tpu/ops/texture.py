"""Texture sampling on the VPU (the fixed-function sampler analog).

The reference has no textures (its shaders return constant color,
src/cube.slang:63-67); BASELINE config 3 requires bilinear sampling, so
this is net-new capability.  Textures are (H, W, C) float32 arrays in HBM;
sampling is vectorized gathers over the whole framebuffer's UV field.
"""

from __future__ import annotations

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
