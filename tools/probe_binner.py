#!/usr/bin/env python
"""Sub-stage attribution of the binner on the big-mesh frame (real TPU).

Times prefix programs of bin_triangles' internals (expansion -> sort ->
searchsorted -> fused template gather -> transpose) with the scan
method; consecutive differences are the stage costs.  The full-binner
number comes from probe_stages.py prefix 2 (zero-count raster consumer),
since a bare checksum lets XLA pick a pathological layout for the record
stack.

    nohup python tools/probe_binner.py > /tmp/probe_binner.log 2>&1 &
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
    from based_renderer_tpu.models import demos
    from based_renderer_tpu import shader as shader_lib
    from based_renderer_tpu.ops.vertex import expand_instances, gather_triangles
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.ops import binning
    from based_renderer_tpu.ops import fixedpoint as fp
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    W, H = 1920, 1080
    TRIS = 1_000_000
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=TRIS)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile
    u0 = uniforms(0.0)

    def uniforms_at(t):
        c, s = jnp.cos(t * 0.5), jnp.sin(t * 0.5)
        rot = jnp.asarray(
            [[c, 0.0, s, 0.0], [0.0, 1.0, 0.0, 0.0], [-s, 0.0, c, 0.0], [0.0, 0.0, 0.0, 1.0]],
            jnp.float32,
        )
        u = dict(u0)
        u["model"] = rot
        return u

    num_tx = -(-W // tile_w)
    num_ty = -(-H // tile_h)
    num_tiles = num_tx * num_ty

    def prefix(depth, max_pairs, slots):
        def body(carry, t_i):
            t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-20
            u = uniforms_at(t)
            attrs, tri_idx = expand_instances(mesh, {})
            clip, varyings = sh.vertex(attrs, u)
            clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
            ts = setup_triangles(
                clip_tri, W, H, cull_mode=pipe.cull_mode, front_face=pipe.front_face
            )
            channels = jnp.concatenate(
                [var_tri[k] for k in sorted(var_tri)], axis=-1
            )
            num_tris = clip_tri.shape[0]

            # --- mirror of bin_triangles' expansion (first-tile/extras) ---
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
            first_tile = jnp.where(live, y0 * num_tx + x0, jnp.int32(num_tiles))
            tri_ids = jnp.arange(num_tris, dtype=jnp.int32)
            extra_budget = max(max_pairs - num_tris, 0)
            ke = jnp.maximum(k - 1, 0)
            eoffsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(ke, dtype=jnp.int32)]
            )
            total_extra = eoffsets[-1]
            e_table = jnp.stack(
                [eoffsets[:-1], jnp.maximum(bw, 1), x0, y0, tri_ids], axis=1
            )
            eexp = jnp.repeat(e_table, ke, axis=0, total_repeat_length=extra_budget)
            eT = jax.lax.optimization_barrier(eexp.T)
            extra_idx = jnp.arange(extra_budget, dtype=jnp.int32)
            e_in_range = extra_idx < total_extra
            seq = extra_idx - eT[0] + 1
            e_tile = jnp.where(
                e_in_range,
                (eT[3] + seq // eT[1]) * num_tx + eT[2] + seq % eT[1],
                jnp.int32(num_tiles),
            )
            tile_id_all = jnp.concatenate([first_tile, e_tile])
            tri_all = jnp.concatenate([tri_ids, eT[4]])
            if depth == 0:  # expansion
                return carry + jnp.sum(tile_id_all) + jnp.sum(tri_all), ()
            tile_id_sorted, t_slot = jax.lax.sort(
                [tile_id_all, tri_all], num_keys=2, is_stable=False
            )
            if slots is not None and slots < max_pairs:
                tile_id_sorted = tile_id_sorted[:slots]
                t_slot = t_slot[:slots]
            if depth == 1:  # + sort
                return carry + jnp.sum(tile_id_sorted[::129]) + jnp.sum(t_slot[::129]), ()
            tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
            tstart = jnp.searchsorted(tile_id_sorted, tile_range, side="left")
            tend = jnp.searchsorted(tile_id_sorted, tile_range, side="right")
            if depth == 2:  # + searchsorted
                return carry + jnp.sum(tstart) + jnp.sum(tend) + jnp.sum(t_slot[::129]), ()
            ti, tf = binning._triangle_templates(ts, 0, channels, True)
            if depth == 3:  # + templates (per-triangle, no gather)
                return carry + jnp.sum(ti[::177].astype(jnp.float32)) + jnp.sum(tf[::177]), ()
            fused = jnp.concatenate(
                [ti, jax.lax.bitcast_convert_type(tf, jnp.int32)], axis=1
            )
            n_all = fused.shape[1]
            pad_to = -(-n_all // 64) * 64
            if pad_to != n_all:
                fused = jnp.pad(fused, ((0, 0), (0, pad_to - n_all)))
            fused = jax.lax.optimization_barrier(fused)
            gathered = fused[t_slot]
            if depth == 4:  # + row gather (pre-transpose)
                gb = jax.lax.optimization_barrier(gathered)
                return carry + jnp.sum(gb[::129, 0]) + jnp.sum(gb[::129, 32]), ()
            fused_sT = jax.lax.optimization_barrier(gathered.T)
            if depth == 5:  # + transpose to field-major
                return carry + jnp.sum(fused_sT[0, ::129]) + jnp.sum(fused_sT[32, ::129]), ()
            return carry, ()

        return body

    def timed(name, body, n1=2, n2=8, reps=3):
        def run(n):
            @jax.jit
            def prog(c0):
                c, _ = jax.lax.scan(body, c0, jnp.arange(n, dtype=jnp.int32))
                return c

            np.asarray(prog(jnp.float32(1.0)))
            best = 1e9
            for kk in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(jnp.float32(1.0 + 1e-3 * kk)))
                best = min(best, time.perf_counter() - t0)
            return best

        a, b = run(n1), run(n2)
        dt = (b - a) / (n2 - n1)
        print(f"{name}: {dt * 1e3:8.2f} ms", flush=True)
        return dt

    for label, mp, sl in (
        ("OLD pairs=1.5M slots=None", 1_500_000, None),
        ("NEW pairs=1.15M slots=0.7M", 1_150_000, 700_032),
    ):
        print(f"== {label}", flush=True)
        prev = 0.0
        for d, nm in enumerate(
            ["expand", "+sort", "+searchsorted", "+templates", "+gather", "+transpose"]
        ):
            dt = timed(nm, prefix(d, mp, sl))
            print(f"   stage += {(dt - prev) * 1e3:8.2f} ms", flush=True)
            prev = dt


if __name__ == "__main__":
    main()
