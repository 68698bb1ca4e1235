"""Near-plane (w) clipping: the clipper stage of primitive assembly.

The reference relies on the GPU's fixed-function clipper; here clipping is
an explicit vectorized stage between the vertex shader and triangle setup.
Each input triangle is clipped against the plane ``w = eps`` (in front of
the eye), producing 0, 1, or 2 output triangles — statically shaped as
exactly 2 slots per input, with unused slots written as degenerate
(all-equal vertices, area 0) so setup culls them for free.

No x/y/z plane clipping is needed: the rasterizer's guard band
(ops/fixedpoint.py, +-8192 px) absorbs off-screen geometry, and depth
clipping of z outside [0, 1] happens per-fragment per the depth spec
(Vulkan-style depth clip).
"""

from __future__ import annotations

import jax.numpy as jnp


def clip_near(clip_pos: jnp.ndarray, varyings: dict, eps: float = 1e-5):
    """Clip triangles against w >= eps.

    Args:
      clip_pos: (T, 3, 4) f32 clip positions.
      varyings: dict of (T, 3, C) per-vertex attributes (lerped at cuts).
    Returns:
      (2T, 3, 4) positions and dict of (2T, 3, C) varyings; triangle 2t
      and 2t+1 are the (up to two) pieces of input triangle t, in input
      order — draw-order depth semantics are preserved.
    """
    w = clip_pos[..., 3]
    inside = w > jnp.float32(eps)  # (T, 3)
    n_in = inside.sum(axis=-1)  # 0..3

    # Canonical rotation r per triangle so the inside pattern becomes one
    # of: [1,?,?] with a distinguished first vertex.
    #   n_in == 1: rotate the single inside vertex to slot 0.
    #   n_in == 2: rotate the single OUTSIDE vertex to slot 2.
    i0, i1, i2 = inside[:, 0], inside[:, 1], inside[:, 2]
    rot1 = jnp.where(i0, 0, jnp.where(i1, 1, 2))  # index of an inside vert
    rot2 = jnp.where(~i0, 1, jnp.where(~i1, 2, 0))  # (outside idx + 1) % 3
    rot = jnp.where(n_in == 1, rot1, jnp.where(n_in == 2, rot2, 0)).astype(jnp.int32)

    idx = (rot[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]) % 3  # (T, 3)
    tgather = jnp.arange(clip_pos.shape[0])[:, None]
    p = clip_pos[tgather, idx]  # rotated positions (T, 3, 4)
    v = {k: a[tgather, idx] for k, a in varyings.items()}

    def lerp_cut(a, b):
        """Intersection of segment a->b with w = eps (per-component lerp)."""
        wa = p[:, a, 3]
        wb = p[:, b, 3]
        t = (jnp.float32(eps) - wa) / jnp.where(wb == wa, jnp.float32(1.0), wb - wa)
        t = jnp.clip(t, 0.0, 1.0)[:, None]
        pos = p[:, a] + (p[:, b] - p[:, a]) * t
        var = {k: a2[:, a] + (a2[:, b] - a2[:, a]) * t for k, a2 in v.items()}
        return pos, var

    cut01, vcut01 = lerp_cut(0, 1)  # on edge v0 -> v1
    cut02, vcut02 = lerp_cut(0, 2)
    cut12, vcut12 = lerp_cut(1, 2)
    cut20, vcut20 = lerp_cut(2, 0)

    n = n_in[:, None, None]

    def pick(all_in, one_in, two_in):
        """Select per-triangle among the three shaped variants."""
        return jnp.where(n == 3, all_in, jnp.where(n == 1, one_in, two_in))

    # Slot A: n=3 -> original; n=1 -> (v0, cut01, cut02); n=2 (v0, v1 in,
    # v2 out) -> (v0, v1, cut12).
    slot_a = pick(
        p,
        jnp.stack([p[:, 0], cut01, cut02], axis=1),
        jnp.stack([p[:, 0], p[:, 1], cut12], axis=1),
    )
    # Slot B: n=3 or n=1 -> degenerate; n=2 -> (v0, cut12, cut20).
    degen = jnp.repeat(p[:, :1], 3, axis=1)  # zero-area triangle
    slot_b = jnp.where(
        n == 2, jnp.stack([p[:, 0], cut12, cut20], axis=1), degen
    )
    # n = 0: make both slots degenerate.
    slot_a = jnp.where(n == 0, degen, slot_a)

    out_pos = jnp.stack([slot_a, slot_b], axis=1).reshape(-1, 3, 4)
    out_var = {}
    for k in varyings:
        va = pick(
            v[k],
            jnp.stack([v[k][:, 0], vcut01[k], vcut02[k]], axis=1),
            jnp.stack([v[k][:, 0], v[k][:, 1], vcut12[k]], axis=1),
        )
        vdeg = jnp.repeat(v[k][:, :1], 3, axis=1)
        vb = jnp.where(n == 2, jnp.stack([v[k][:, 0], vcut12[k], vcut20[k]], axis=1), vdeg)
        va = jnp.where(n == 0, vdeg, va)
        out_var[k] = jnp.stack([va, vb], axis=1).reshape(-1, 3, v[k].shape[-1])
    return out_pos, out_var
