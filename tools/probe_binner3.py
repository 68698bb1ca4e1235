#!/usr/bin/env python
"""Binner round-4 A/Bs (real TPU, ONE leg per fresh process).

    for L in tmpl_cur tmpl_T64 tmpl_T128 gath_T64 exp_a exp_b exp_c exp_d; do
        python tools/probe_binner3.py $L; done

Two questions, motivated by probe_binner2's split (expand 11.9, templates
11.4, sort ~3, fuse/pad ~1.7 of the 34.6 ms binner @ 1M tris 1080p):

1. Is the template cost really the jnp.stack(axis=-1) column-interleave
   (one near-footprint lane-tiled pass PER column, like the column READS
   CLAUDE.md measured at ~50 ms/30 cols)?  A/B: current layout vs
   stack(axis=0) into field-major (W, T) + ONE transpose.
2. Where inside expand do the 11.9 ms go (bbox math / cumsum /
   searchsorted-sort / e_table stack+gather)?
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    leg = sys.argv[1]
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu import shader as shader_lib
    from based_renderer_tpu.ops.vertex import expand_instances, gather_triangles
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.ops import binning
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    W, H = 1920, 1080
    TRIS = 1_000_000
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=TRIS)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile
    u0 = uniforms(0.0)

    num_tx = -(-W // tile_w)
    num_ty = -(-H // tile_h)
    num_tiles = num_tx * num_ty

    attrs0, tri_idx = expand_instances(mesh, {})

    def body(carry, t_i):
        t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-20
        c, s = jnp.cos(t * 0.5), jnp.sin(t * 0.5)
        rot = jnp.asarray(
            [[c, 0.0, s, 0.0], [0.0, 1.0, 0.0, 0.0], [-s, 0.0, c, 0.0], [0.0, 0.0, 0.0, 1.0]],
            jnp.float32,
        )
        u = dict(u0)
        u["model"] = rot
        clip, varyings = sh.vertex(attrs0, u)
        clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
        ts = setup_triangles(
            clip_tri, W, H, cull_mode=pipe.cull_mode, front_face=pipe.front_face
        )
        channels = jnp.concatenate([var_tri[k] for k in sorted(var_tri)], axis=-1)
        num_tris = clip_tri.shape[0]
        max_pairs = max(int(num_tris * pipe.raster_pairs_factor), 1024)
        slots = max(int(num_tris * pipe.raster_slots_factor), 1024)

        # ---------------- template-layout arms ----------------
        if leg in ("tbuild", "tsortb", "lgath"):
            # Field-major build WITHOUT any transpose to row-major: the
            # only consumer of (T, W) row-major layout is the row gather;
            # these legs ask what it costs to stay field-major end-to-end
            # (lane gather fusedT[:, t_slot] feeding a column-major
            # assembly kernel).
            tiT, tfT = binning._triangle_templates(
                ts, 0, channels, True, transposed=True
            )
            fusedT = jnp.concatenate(
                [tiT, jax.lax.bitcast_convert_type(tfT, jnp.int32)], axis=0
            )
            n_all = fusedT.shape[0]
            pad_to = -(-n_all // 64) * 64
            if pad_to != n_all:
                fusedT = jnp.pad(fusedT, ((0, pad_to - n_all), (0, 0)))
            fusedT = jax.lax.optimization_barrier(fusedT)
            if leg == "tbuild":
                return carry + jnp.sum(fusedT[0, ::177].astype(jnp.float32)) + jnp.sum(
                    fusedT[40, ::177].astype(jnp.float32)
                ), ()
            bx0 = jnp.maximum(ts.bbox[:, 0], 0)
            by0 = jnp.maximum(ts.bbox[:, 1], 0)
            bx1 = jnp.minimum(ts.bbox[:, 2], W)
            by1 = jnp.minimum(ts.bbox[:, 3], H)
            nonempty = (bx1 > bx0) & (by1 > by0)
            live = ts.valid & nonempty
            x0 = bx0 // tile_w
            y0 = by0 // tile_h
            first_tile = jnp.where(live, y0 * num_tx + x0, jnp.int32(num_tiles))
            tri_ids = jnp.arange(num_tris, dtype=jnp.int32)
            pad_e = max_pairs - num_tris
            tile_id_all = jnp.concatenate(
                [first_tile, jnp.full((pad_e,), jnp.int32(num_tiles))]
            )
            tri_all = jnp.concatenate([tri_ids, jnp.zeros((pad_e,), jnp.int32)])
            tri_bits = max(int(num_tris - 1).bit_length(), 1)
            key_all = (tile_id_all << tri_bits) | tri_all
            (key_sorted,) = jax.lax.sort([key_all], num_keys=1, is_stable=False)
            slots_al = max(-(-slots // 128) * 128, 128)
            key_sorted = key_sorted[:slots_al]
            t_slot = key_sorted & jnp.int32((1 << tri_bits) - 1)
            if leg == "tsortb":
                return carry + jnp.sum(t_slot[::129]) + jnp.sum(
                    fusedT[0, ::177].astype(jnp.float32)
                ), ()
            p_pad = -(-(slots_al + 128) // 128) * 128
            gathT = fusedT[:, jnp.pad(t_slot, (0, p_pad - slots_al))]
            gb = jax.lax.optimization_barrier(gathT)
            return carry + jnp.sum(gb[0, ::129].astype(jnp.float32)) + jnp.sum(
                gb[32, ::129].astype(jnp.float32)
            ), ()
        if leg.startswith("tmpl") or leg.startswith("gath"):
            if leg == "tmpl_cur":
                ti, tf = binning._triangle_templates(ts, 0, channels, True)
                fused = jnp.concatenate(
                    [ti, jax.lax.bitcast_convert_type(tf, jnp.int32)], axis=1
                )
                n_all = fused.shape[1]
                pad_to = -(-n_all // 64) * 64
                if pad_to != n_all:
                    fused = jnp.pad(fused, ((0, 0), (0, pad_to - n_all)))
                fused = jax.lax.optimization_barrier(fused)
                return carry + jnp.sum(fused[::177, 0].astype(jnp.float32)) + jnp.sum(
                    fused[::177, 40].astype(jnp.float32)
                ), ()
            # transposed build: stack(axis=0) writes each field as one
            # contiguous (T,) row — no per-column lane interleave.
            tiT, tfT = binning._triangle_templates(
                ts, 0, channels, True, transposed=True
            )
            fusedT = jnp.concatenate(
                [tiT, jax.lax.bitcast_convert_type(tfT, jnp.int32)], axis=0
            )
            n_all = fusedT.shape[0]
            pad_to = 64 if leg.endswith("64") else 128
            pad_to = -(-n_all // pad_to) * pad_to
            if pad_to != n_all:
                fusedT = jnp.pad(fusedT, ((0, pad_to - n_all), (0, 0)))
            fusedT = jax.lax.optimization_barrier(fusedT)
            if leg.startswith("tmpl"):
                fused = jax.lax.optimization_barrier(fusedT.T)
                return carry + jnp.sum(fused[::177, 0].astype(jnp.float32)) + jnp.sum(
                    fused[::177, 40].astype(jnp.float32)
                ), ()
            # gath_T64: transposed build + transpose + sorted-slot gather
            fused = jax.lax.optimization_barrier(fusedT.T)
            # (sort to get t_slot, mirroring production)
            bx0 = jnp.maximum(ts.bbox[:, 0], 0)
            by0 = jnp.maximum(ts.bbox[:, 1], 0)
            bx1 = jnp.minimum(ts.bbox[:, 2], W)
            by1 = jnp.minimum(ts.bbox[:, 3], H)
            nonempty = (bx1 > bx0) & (by1 > by0)
            live = ts.valid & nonempty
            x0 = bx0 // tile_w
            y0 = by0 // tile_h
            first_tile = jnp.where(live, y0 * num_tx + x0, jnp.int32(num_tiles))
            tri_ids = jnp.arange(num_tris, dtype=jnp.int32)
            pad_e = max_pairs - num_tris
            tile_id_all = jnp.concatenate(
                [first_tile, jnp.full((pad_e,), jnp.int32(num_tiles))]
            )
            tri_all = jnp.concatenate([tri_ids, jnp.zeros((pad_e,), jnp.int32)])
            tri_bits = max(int(num_tris - 1).bit_length(), 1)
            key_all = (tile_id_all << tri_bits) | tri_all
            (key_sorted,) = jax.lax.sort([key_all], num_keys=1, is_stable=False)
            slots_al = max(-(-slots // 128) * 128, 128)
            key_sorted = key_sorted[:slots_al]
            t_slot = key_sorted & jnp.int32((1 << tri_bits) - 1)
            p_pad = -(-(slots_al + 128) // 128) * 128
            gath = fused[jnp.pad(t_slot, (0, p_pad - slots_al))]
            gb = jax.lax.optimization_barrier(gath)
            return carry + jnp.sum(gb[::129, 0].astype(jnp.float32)) + jnp.sum(
                gb[::129, 32].astype(jnp.float32)
            ), ()

        # ---------------- expand sub-legs ----------------
        bx0 = jnp.maximum(ts.bbox[:, 0], 0)
        by0 = jnp.maximum(ts.bbox[:, 1], 0)
        bx1 = jnp.minimum(ts.bbox[:, 2], W)
        by1 = jnp.minimum(ts.bbox[:, 3], H)
        nonempty = (bx1 > bx0) & (by1 > by0)
        x0 = bx0 // tile_w
        y0 = by0 // tile_h
        x1 = (bx1 - 1) // tile_w
        y1 = (by1 - 1) // tile_h
        live = ts.valid & nonempty
        bw = jnp.where(live, x1 - x0 + 1, 0)
        bh = jnp.where(live, y1 - y0 + 1, 0)
        k = bw * bh
        num_valid_pairs = jnp.sum(live.astype(jnp.int32))
        first_tile = jnp.where(live, y0 * num_tx + x0, jnp.int32(num_tiles))
        tri_ids = jnp.arange(num_tris, dtype=jnp.int32)
        if leg == "exp_a":
            return carry + jnp.sum(first_tile) + jnp.sum(k) + num_valid_pairs, ()
        extra_budget = max(max_pairs - num_tris, 0)
        ke = jnp.maximum(k - 1, 0)
        eoffsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(ke, dtype=jnp.int32)]
        )
        total_extra = eoffsets[-1]
        total = num_valid_pairs + jnp.minimum(total_extra, extra_budget)
        if leg == "exp_b":
            return carry + jnp.sum(eoffsets[::513]) + total + jnp.sum(first_tile), ()
        extra_idx = jnp.arange(extra_budget, dtype=jnp.int32)
        t_of_e = jnp.searchsorted(
            eoffsets[1:], extra_idx, side="right", method="sort"
        ).astype(jnp.int32)
        if leg == "exp_c":
            return carry + jnp.sum(t_of_e[::257]) + jnp.sum(first_tile) + total, ()
        e_table = jnp.stack(
            [eoffsets[:-1], jnp.maximum(bw, 1), x0, y0, tri_ids], axis=1
        )
        eexp = e_table[jnp.minimum(t_of_e, jnp.int32(num_tris - 1))]
        eT = jax.lax.optimization_barrier(eexp.T)
        e_in_range = extra_idx < total_extra
        seq = extra_idx - eT[0] + 1
        bw_t = eT[1]
        e_tile_y = eT[3] + seq // bw_t
        e_tile_x = eT[2] + seq % bw_t
        e_tile = jnp.where(
            e_in_range, e_tile_y * num_tx + e_tile_x, jnp.int32(num_tiles)
        )
        # exp_d == probe_binner2 leg 0 (full expand)
        return carry + jnp.sum(jnp.concatenate([first_tile, e_tile])) + jnp.sum(
            jnp.concatenate([tri_ids, eT[4]])
        ), ()

    def run(n):
        @jax.jit
        def prog(c0):
            c, _ = jax.lax.scan(body, c0, jnp.arange(n, dtype=jnp.int32))
            return c

        np.asarray(prog(jnp.float32(1.0)))
        best = 1e9
        for kk in range(3):
            t0 = time.perf_counter()
            np.asarray(prog(jnp.float32(1.0 + 1e-3 * kk)))
            best = min(best, time.perf_counter() - t0)
        return best

    a, b = run(2), run(8)
    dt = (b - a) / 6
    print(f"leg {leg:10s}: {dt * 1e3:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
