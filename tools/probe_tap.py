#!/usr/bin/env python
"""Decompose the textured-frame cost on real TPU: texture-tap variants
and covered-tile-compaction machinery, each timed as per-step-different
lax.scan bodies at two lengths, differenced (the only honest method on
this tunnel — CLAUDE.md).

    nohup python tools/probe_tap.py > /tmp/probe_tap.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import geometry
    from based_renderer_tpu.ops import texture as tx
    from based_renderer_tpu.ops import compact as cp
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    H, W = 1080, 1920
    NT = cp.num_tiles(H, W)
    BUDGET = 512

    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    tex = r.upload_texture(
        geometry.checkerboard_texture(), mipmaps=True, mip_filter="linear"
    )

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) / H,
        jnp.arange(W, dtype=jnp.float32) / W,
        indexing="ij",
    )
    base_uv = jnp.stack([xx * 3.0, yy * 3.0], axis=-1)

    def timed_scan(name, body, n1=4, n2=16, reps=2):
        """body(t_scalar) -> f32 checksum scalar; per-step-different."""

        def scan_fn(n):
            def step(carry, i):
                t = i.astype(jnp.float32) * 0.016 + carry * 1e-20
                return carry + body(t), ()

            def run(phase):
                out, _ = jax.lax.scan(
                    step, phase, jnp.arange(n, dtype=jnp.int32)
                )
                return out

            return jax.jit(run)

        f1, f2 = scan_fn(n1), scan_fn(n2)
        jax.block_until_ready(f1(jnp.float32(0.5)))
        jax.block_until_ready(f2(jnp.float32(0.5)))
        best = 1e9
        for k in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f1(jnp.float32(1e-3 * (k + 1))))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f2(jnp.float32(1e-3 * (k + 1))))
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / (n2 - n1))
        print(f"{name}: {best * 1e3:.3f} ms", flush=True)
        return best

    def uv_at(t):
        return base_uv * (1.0 + 0.1 * t) + t

    # ---- tap variants on the full 2M-px field ----
    timed_scan("uv_only", lambda t: jnp.sum(uv_at(t)))
    timed_scan(
        "lod_only",
        lambda t: jnp.sum(tx.lod_from_uv(uv_at(t), 256, 256)),
    )
    timed_scan(
        "tap_fixed0",
        lambda t: jnp.sum(
            tx._sample_packed_level(
                tex, uv_at(t), jnp.zeros((H, W), jnp.int32)
            )
        ),
    )
    timed_scan(
        "tap_nearest_mip",
        lambda t: jnp.sum(
            tx._sample_packed_level(
                tex,
                uv_at(t),
                jnp.clip(
                    jnp.round(tx.lod_from_uv(uv_at(t), 256, 256)).astype(
                        jnp.int32
                    ),
                    0,
                    8,
                ),
            )
        ),
    )
    timed_scan(
        "tap_trilinear",
        lambda t: jnp.sum(
            tx.sample_trilinear(
                tex, uv_at(t), tx.lod_from_uv(uv_at(t), 256, 256)
            )
        ),
    )

    def two_fixed(t):
        uv = uv_at(t)
        s0 = tx._sample_packed_level(tex, uv, jnp.zeros((H, W), jnp.int32))
        s1 = tx._sample_packed_level(tex, uv, jnp.ones((H, W), jnp.int32))
        return jnp.sum(s0 * 0.5 + s1 * 0.5)

    timed_scan("tap_two_fixed_levels", two_fixed)

    def tri_single_gather(t):
        # Trilinear as ONE flat gather of 2x indices (levels interleaved
        # on a new minor axis) instead of two separate gathers.
        uv = uv_at(t)
        lod = tx.lod_from_uv(uv, 256, 256)
        lodc = jnp.clip(lod, 0.0, 8.0)
        l0 = jnp.floor(lodc).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, 8)
        frac = lodc - l0.astype(jnp.float32)
        lvl2 = jnp.stack([l0, l1], axis=-1)  # (H, W, 2)
        s = tx._sample_packed_level(tex, uv[..., None, :], lvl2)  # (H,W,2,C)
        out = s[..., 0, :] * (1.0 - frac[..., None]) + s[..., 1, :] * frac[..., None]
        return jnp.sum(out)

    timed_scan("tap_trilinear_1gather", tri_single_gather)

    # ---- compaction machinery on synthetic planar fields ----
    C = 9

    def fields_at(t):
        f32 = (
            jnp.broadcast_to(base_uv[..., :1].transpose(2, 0, 1), (C, H, W))
            + t
        )
        tri = (xx * 100 + t).astype(jnp.int32) - 50  # ~half covered
        color = jnp.broadcast_to(jnp.float32(0.25) + t, (4, H, W))
        return f32, tri, color

    timed_scan(
        "tile_rows_9ch",
        lambda t: jnp.sum(cp.tile_rows(fields_at(t)[0], H, W)[:, ::257]),
    )

    def chmajor_rows(planes, h, w):
        c = planes.shape[0]
        nty, ntx = h // 8, w // 128
        return (
            planes.reshape(c, nty, 8, ntx, 128)
            .transpose(1, 3, 0, 2, 4)
            .reshape(nty * ntx, c * 8 * 128)
        )

    timed_scan(
        "tile_rows_9ch_chmajor",
        lambda t: jnp.sum(chmajor_rows(fields_at(t)[0], H, W)[:, ::257]),
    )

    def machinery_noop(t):
        f32, tri, color = fields_at(t)
        mask = tri >= 0
        order, _cnt = cp.covered_tile_order(mask, H, W)
        sel = order[:BUDGET]
        g_f = cp.gather_tiles(cp.tile_rows(f32, H, W), sel, C)
        g_i = cp.gather_tiles(cp.tile_rows(tri[None], H, W), sel, 1)[..., 0]
        rows_c = cp.tile_rows(color, H, W)
        color_t = cp.gather_tiles(rows_c, sel, 4)
        # trivial "fragment": rgba from the first 4 f32 channels
        rgba_t = g_f[..., :4] * 0.5
        out_t = jnp.where((g_i >= 0)[..., None], rgba_t, color_t)
        new_rows = cp.scatter_tiles(rows_c, sel, out_t)
        return jnp.sum(cp.untile_rows(new_rows, 4, H, W)[:, ::7, ::13])

    timed_scan("compact_machinery_noop", machinery_noop)

    def machinery_tap(t):
        f32, tri, color = fields_at(t)
        mask = tri >= 0
        order, _cnt = cp.covered_tile_order(mask, H, W)
        sel = order[:BUDGET]
        g_f = cp.gather_tiles(cp.tile_rows(f32, H, W), sel, C)
        uv_t = g_f[..., :2]
        lod_t = jnp.zeros(uv_t.shape[:-1], jnp.float32) + (t % 3.0)
        s = tx.sample_trilinear(tex, uv_t, lod_t)
        rows_c = cp.tile_rows(color, H, W)
        color_t = cp.gather_tiles(rows_c, sel, 4)
        out_t = jnp.concatenate([s, color_t[..., 3:]], axis=-1)
        new_rows = cp.scatter_tiles(rows_c, sel, out_t)
        return jnp.sum(cp.untile_rows(new_rows, 4, H, W)[:, ::7, ::13])

    timed_scan("compact_machinery_trilinear_tap", machinery_tap)

    def order_only(t):
        _f32, tri, _color = fields_at(t)
        order, cnt = cp.covered_tile_order(tri >= 0, H, W)
        return jnp.sum(order[::17].astype(jnp.float32)) + cnt.astype(
            jnp.float32
        )

    timed_scan("covered_tile_order", order_only)


if __name__ == "__main__":
    main()
