#!/usr/bin/env python
"""Split bin vs raster cost in the big_mesh frame by stage-doubling.

Prefix-truncated programs mis-compile (a reduction-consumed binner loses
the layout/fusion constraints the Pallas consumer imposes and comes out
~2.4x slower than the real thing — measured), so this probe only times
FULL pipelines and attributes by doubling one stage inside the real
dataflow:

  base      = vertex+setup+bin+raster
  raster2   = vertex+setup+bin+raster+raster   (second raster continues
              from the first's vis: same records, live dependency)
  raster cost ~= raster2 - base;  bin cost ~= base - raster - vertex/setup

    nohup python tools/probe_split.py > /tmp/probe_split.log 2>&1 &
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

    W, H = 1920, 1080
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=1_000_000)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile
    u0 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else jnp.asarray(x),
        uniforms(0.0),
    )
    mesh_dev = Mesh(attributes=mesh.attributes, indices=mesh.indices)

    def make_body(n_raster):
        def body(carry, t_i):
            t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-6
            c_, s_ = jnp.cos(t * 0.5), jnp.sin(t * 0.5)
            rot = jnp.asarray(
                [
                    [c_, 0.0, s_, 0.0],
                    [0.0, 1.0, 0.0, 0.0],
                    [-s_, 0.0, c_, 0.0],
                    [0.0, 0.0, 0.0, 1.0],
                ],
                jnp.float32,
            )
            u = dict(u0)
            u["model"] = rot
            attrs, tri_idx = expand_instances(mesh_dev, {})
            clip, varyings = sh.vertex(attrs, u)
            clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
            ts = setup_triangles(
                clip_tri, W, H, cull_mode=pipe.cull_mode, front_face=pipe.front_face
            )
            channels = jnp.concatenate(
                [var_tri[k] for k in sorted(var_tri)], axis=-1
            )
            binned = bin_triangles(
                ts,
                W,
                H,
                tile_w,
                tile_h,
                max(int(clip_tri.shape[0] * pipe.raster_pairs_factor), 1024),
                0,
                channels=channels,
                perspective=True,
            )
            vis = None
            acc = carry
            for _ in range(n_raster):
                out = rasterize_binned(
                    binned,
                    W,
                    H,
                    tile_w=tile_w,
                    tile_h=tile_h,
                    depth_clip=pipe.depth.clip,
                    num_channels=channels.shape[-1],
                    sublane=True,
                    init=vis,
                )
                vis, interp, invw = out
                acc = acc + jnp.sum(vis.depth_q.astype(jnp.float32)) + jnp.sum(
                    interp[0]
                )
            return acc, ()

        return body

    def timed(n_raster, n1=2, n2=8, reps=3):
        body = make_body(n_raster)

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

        a, b = run(n1), run(n2)
        return (b - a) / (n2 - n1)

    base = timed(1)
    print(f"base (bin + 1x raster):  {base * 1e3:8.2f} ms/frame", flush=True)
    dbl = timed(2)
    print(f"dbl  (bin + 2x raster):  {dbl * 1e3:8.2f} ms/frame", flush=True)
    raster = dbl - base
    print(
        f"=> raster ~= {raster * 1e3:.2f} ms, bin ~= {(base - raster) * 1e3:.2f} ms"
        f" (minus ~0.7 vertex/setup)",
        flush=True,
    )


if __name__ == "__main__":
    main()
