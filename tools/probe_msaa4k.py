#!/usr/bin/env python
"""Per-stage attribution of the big-mesh 4K MSAA-4x frame on real TPU.

Same elision-proof prefix discipline as probe_stages.py (per-step-different
lax.scan, two lengths, differenced) but at 3840x2160 with the
coverage-sample MSAA-4x kernel — the BASELINE config-5 4K row.

    nohup python tools/probe_msaa4k.py > /tmp/probe_msaa4k.log 2>&1 &
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
    from based_renderer_tpu.scene import Mesh
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.ops.binning import bin_triangles
    from based_renderer_tpu.ops.raster_pallas import rasterize_binned
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    W, H = 3840, 2160
    TRIS = 1_000_000
    r = brt.Renderer(brt.RendererConfig(width=W, height=H, msaa=4))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=TRIS)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile
    u0 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else jnp.asarray(x),
        uniforms(0.0),
    )

    def uniforms_at(t_scalar):
        c, s = jnp.cos(t_scalar * 0.5), jnp.sin(t_scalar * 0.5)
        rot = jnp.asarray(
            [[c, 0.0, s, 0.0], [0.0, 1.0, 0.0, 0.0], [-s, 0.0, c, 0.0], [0.0, 0.0, 0.0, 1.0]],
            jnp.float32,
        )
        u = dict(u0)
        u["model"] = rot
        return u

    mesh_dev = Mesh(attributes=mesh.attributes, indices=mesh.indices)
    max_pairs = max(int(2_000_000 * pipe.raster_pairs_factor / 2), 1024)

    def prefix(depth):
        def body(carry, t_i):
            t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-6
            u = uniforms_at(t)
            attrs, tri_idx = expand_instances(mesh_dev, {})
            clip, varyings = sh.vertex(attrs, u)
            clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
            ts = setup_triangles(
                clip_tri, W, H, cull_mode=pipe.cull_mode, front_face=pipe.front_face
            )
            if depth == 1:
                return (
                    carry + jnp.sum(ts.bbox.astype(jnp.float32)) + jnp.sum(ts.inv_w),
                    (),
                )
            var_keys = sorted(var_tri)
            channels = jnp.concatenate([var_tri[k] for k in var_keys], axis=-1)
            num_t = clip_tri.shape[0]
            binned = bin_triangles(
                ts,
                W,
                H,
                tile_w,
                tile_h,
                max(int(num_t * pipe.raster_pairs_factor), 1024),
                0,
                channels=channels,
                perspective=True,
                msaa4=True,
                slots=(
                    None
                    if pipe.raster_slots_factor is None
                    else max(int(num_t * pipe.raster_slots_factor), 1024)
                ),
            )
            if depth == 2:
                binned = binned._replace(tile_count=jnp.zeros_like(binned.tile_count))
            out = rasterize_binned(
                binned,
                W,
                H,
                tile_w=tile_w,
                tile_h=tile_h,
                depth_clip=pipe.depth.clip,
                num_channels=channels.shape[-1],
                msaa4=True,
            )
            vis, interp, invw = out
            if depth in (2, 3):
                return (
                    carry
                    + jnp.sum(vis.depth_q.astype(jnp.float32))
                    + jnp.sum(interp[0]),
                    (),
                )
            denom = jnp.where(invw == 0, jnp.float32(1.0), invw)
            iv = interp / denom[None]
            frag = {}
            c0 = 0
            for k in var_keys:
                c = var_tri[k].shape[-1]
                frag[k] = jnp.moveaxis(iv[c0 : c0 + c], 0, -1)
                c0 += c
            frag["tri_id"] = vis.tri_id
            frag["depth"] = vis.depth
            frag["bary"] = jnp.stack([vis.b0, vis.b1, vis.b2], axis=-1)
            rgba = sh.fragment(frag, u)
            mask = (vis.tri_id >= 0)[..., None]
            color = jnp.where(mask, rgba, jnp.zeros_like(rgba))
            # MSAA resolve: average the 4 sample layers.
            resolved = jnp.mean(color, axis=0)
            return carry + jnp.sum(resolved), ()

        return body

    def timed(depth, n1=1, n2=4, reps=3):
        body = prefix(depth)

        def run(n):
            @jax.jit
            def prog(c0):
                c, _ = jax.lax.scan(body, c0, jnp.arange(n, dtype=jnp.int32))
                return c

            np.asarray(prog(jnp.float32(1.0)))
            best = 1e9
            for k in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(jnp.float32(1.0 + 1e-3 * k)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(n2) - run(n1)) / (n2 - n1) * 1000.0

    names = {
        1: "vertex+setup",
        2: "+bin(zero-count raster)",
        3: "+raster(msaa4)",
        4: "+shade+resolve",
    }
    prev = 0.0
    for d in (1, 2, 3, 4):
        ms = timed(d)
        print(f"prefix {d} ({names[d]:24s}): {ms:8.2f} ms/frame   stage += {ms - prev:8.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
