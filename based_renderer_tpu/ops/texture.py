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
    return tex[y, x]


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray, wrap: str = "repeat") -> jnp.ndarray:
    """Bilinear sample with texel centers at (i + 0.5) / size."""
    th, tw = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * tw - 0.5
    fy = uv[..., 1] * th - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0.astype(jnp.float32))[..., None]
    ay = (fy - y0.astype(jnp.float32))[..., None]
    x0w = _wrap_coord(x0, tw, wrap)
    x1w = _wrap_coord(x0 + 1, tw, wrap)
    y0w = _wrap_coord(y0, th, wrap)
    y1w = _wrap_coord(y0 + 1, th, wrap)
    t00 = tex[y0w, x0w]
    t01 = tex[y0w, x1w]
    t10 = tex[y1w, x0w]
    t11 = tex[y1w, x1w]
    top = t00 * (1.0 - ax) + t01 * ax
    bot = t10 * (1.0 - ax) + t11 * ax
    return top * (1.0 - ay) + bot * ay
