#!/usr/bin/env python
"""Quantify the ideal chunk-level early-z skip rate on the big-mesh frame.

If the binner ordered each tile's records front-to-back (by conservative
per-record zmin) and the kernel skipped whole 128-record chunks whose
zmin lies behind the tile's current max depth, what fraction of records
would be skipped?  Upper bound: compare each record's conservative zmin
against the tile's FINAL max depth — once zs has converged, the sorted
tail past the threshold is exactly the skippable set.

    nohup python tools/probe_earlyz.py > /tmp/probe_earlyz.log 2>&1 &
"""

import os
import sys

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
    from based_renderer_tpu.ops.binning import bin_triangles
    from based_renderer_tpu.ops import fixedpoint as fp
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    W, H = 1920, 1080
    TRIS = 1_000_000
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=TRIS)
    tile_w, tile_h = pipe.raster_tile
    num_tx = W // tile_w
    num_ty = H // tile_h

    for t in (0.0, 0.8):
        u = uniforms(t)
        frame = r.render_frame(pipe, mesh, u)
        depth_q = np.asarray(frame.depth_q)

        sh = shader_lib.get(pipe.shader)

        @jax.jit
        def binned_z(u):
            attrs, tri_idx = expand_instances(mesh, {})
            clip, varyings = sh.vertex(attrs, u)
            clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
            ts = setup_triangles(
                clip_tri, W, H, cull_mode=pipe.cull_mode, front_face=pipe.front_face
            )
            binned = bin_triangles(
                ts,
                W,
                H,
                tile_w,
                tile_h,
                int(clip_tri.shape[0] * pipe.raster_pairs_factor),
                0,
            )
            rec = binned.records
            zo, dzx, dzy, zsh = rec[9], rec[10], rec[11], rec[12]
            zmin_u = (
                zo
                + jnp.minimum(dzx, 0) * (tile_w - 1)
                + jnp.minimum(dzy, 0) * (tile_h - 1)
            )
            hi = jnp.right_shift(jnp.int32(1 << 29), zsh) + jnp.int32(1)
            zmin_q = (
                jnp.left_shift(jnp.clip(zmin_u, -hi, hi), zsh) + jnp.int32(1 << 29)
            )
            live = rec[0] > jnp.int32(-(1 << 30))
            return zmin_q, live, binned.tile_start, binned.tile_count

        zmin_q, live, tile_start, tile_count = jax.block_until_ready(binned_z(u))
        zmin_q = np.asarray(zmin_q)
        live = np.asarray(live)
        tile_start = np.asarray(tile_start)
        tile_count = np.asarray(tile_count)

        tz = depth_q.reshape(num_ty, tile_h, num_tx, tile_w).max(axis=(1, 3))
        tzmax = tz.reshape(-1)

        total = 0
        skippable = 0
        chunk_skippable = 0
        chunks_total = 0
        for tile in range(num_tx * num_ty):
            n = int(tile_count[tile])
            if n == 0:
                continue
            s = int(tile_start[tile])
            z = np.sort(zmin_q[s : s + n])
            m = z > tzmax[tile]
            total += n
            k = int(m.sum())
            skippable += k
            # chunk-granular: sorted tail, whole 128-chunks only
            chunks_total += -(-n // 128)
            chunk_skippable += (k // 128) if k else 0
        print(
            f"t={t}: records {total}, skippable {skippable} "
            f"({skippable / max(total,1):.3f}), chunk-skippable "
            f"{chunk_skippable}/{chunks_total} "
            f"({chunk_skippable / max(chunks_total,1):.3f}); "
            f"covered px {(depth_q < fp.DEPTH_ONE_Q).mean():.3f}",
            flush=True,
        )
        # distribution of records per tile
        nz = tile_count[tile_count > 0]
        print(
            f"   tiles live {nz.size}, records/tile p50 {np.percentile(nz,50):.0f} "
            f"p90 {np.percentile(nz,90):.0f} max {nz.max()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
