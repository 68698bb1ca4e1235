#!/usr/bin/env python
"""Sub-stage attribution of the PRODUCTION binner (real TPU), one leg per
fresh process (within-process drift: trust only the first timed variant).

    for i in 0 1 2 3 4 5 6; do python tools/probe_binner2.py $i; done

Leg N times a prefix program of bin_triangles' exact production internals
(first-tile/extras expand -> fused-key sort -> slot slice -> searchsorted
-> templates -> fused row gather -> pallas assembly); consecutive
differences across legs are the stage costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LEGS = [
    "expand",
    "+sort",
    "+searchsorted",
    "+templates",
    "+fuse/pad",
    "+gather",
    "+assembly",
]


def main():
    leg = int(sys.argv[1])
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu import shader as shader_lib
    from based_renderer_tpu.ops.vertex import expand_instances, gather_triangles
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.ops import binning, binassem
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

        # --- mirror of bin_triangles (production path) ---
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
        extra_budget = max(max_pairs - num_tris, 0)
        ke = jnp.maximum(k - 1, 0)
        eoffsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(ke, dtype=jnp.int32)]
        )
        total_extra = eoffsets[-1]
        total = num_valid_pairs + jnp.minimum(total_extra, extra_budget)
        e_table = jnp.stack(
            [eoffsets[:-1], jnp.maximum(bw, 1), x0, y0, tri_ids], axis=1
        )
        extra_idx = jnp.arange(extra_budget, dtype=jnp.int32)
        t_of_e = jnp.searchsorted(
            eoffsets[1:], extra_idx, side="right", method="sort"
        ).astype(jnp.int32)
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
        tile_id_all = jnp.concatenate([first_tile, e_tile])
        tri_all = jnp.concatenate([tri_ids, eT[4]])
        if leg == 0:
            return carry + jnp.sum(tile_id_all) + jnp.sum(tri_all), ()
        tri_bits = max(int(num_tris - 1).bit_length(), 1)
        assert ((num_tiles + 1) << tri_bits) <= 2**31
        key_all = (tile_id_all << tri_bits) | tri_all
        (key_sorted,) = jax.lax.sort([key_all], num_keys=1, is_stable=False)
        slots_al = max(-(-slots // 128) * 128, 128)
        key_sorted = key_sorted[:slots_al]
        t_slot = key_sorted & jnp.int32((1 << tri_bits) - 1)
        tile_id_sorted = key_sorted >> tri_bits
        if leg == 1:
            return carry + jnp.sum(tile_id_sorted[::129]) + jnp.sum(t_slot[::129]), ()
        mp = slots_al
        pair_idx = jnp.arange(mp, dtype=jnp.int32)
        tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
        tstart = jnp.searchsorted(tile_id_sorted, tile_range, side="left")
        tend = jnp.searchsorted(tile_id_sorted, tile_range, side="right")
        if leg == 2:
            return carry + jnp.sum(tstart) + jnp.sum(tend) + jnp.sum(t_slot[::129]), ()
        slot_tile = jnp.clip(tile_id_sorted, 0, num_tiles - 1)
        ox = (slot_tile % num_tx) * tile_w
        oy = (slot_tile // num_tx) * tile_h
        ti, tf = binning._triangle_templates(ts, 0, channels, True)
        if leg == 3:
            return carry + jnp.sum(ti[::177].astype(jnp.float32)) + jnp.sum(tf[::177]), ()
        fused = jnp.concatenate(
            [ti, jax.lax.bitcast_convert_type(tf, jnp.int32)], axis=1
        )
        n_all = fused.shape[1]
        pad_to = -(-n_all // 64) * 64
        if pad_to != n_all:
            fused = jnp.pad(fused, ((0, 0), (0, pad_to - n_all)))
        fused = jax.lax.optimization_barrier(fused)
        if leg == 4:
            return carry + jnp.sum(fused[::177, 0].astype(jnp.float32)), ()
        p_pad = -(-(mp + 128) // 128) * 128
        pad_n = p_pad - mp
        gath = fused[jnp.pad(t_slot, (0, pad_n))]
        if leg == 5:
            gb = jax.lax.optimization_barrier(gath)
            return carry + jnp.sum(gb[::129, 0].astype(jnp.float32)) + jnp.sum(
                gb[::129, 32].astype(jnp.float32)
            ), ()
        nch_ = channels.shape[-1]
        records, frecords = binassem.assemble_records(
            gath,
            jnp.pad(ox, (0, pad_n)),
            jnp.pad(oy, (0, pad_n)),
            total,
            nch=nch_,
            msaa4=False,
            rw=binning.record_width(False),
            fw=binning.frecord_width(nch_),
            interpret=False,
        )
        return carry + jnp.sum(records[0, ::129].astype(jnp.float32)) + jnp.sum(
            frecords[0, ::129]
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
    print(f"leg {leg} ({LEGS[leg]:14s}): {dt * 1e3:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
