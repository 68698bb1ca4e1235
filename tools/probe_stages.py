#!/usr/bin/env python
"""Per-stage elision-proof attribution of a demo frame on real TPU.

Times prefix pipelines (vertex -> setup -> bin -> raster -> shade) inside
per-step-different lax.scan dispatches at two lengths, differenced; the
difference of consecutive prefixes is the stage's cost.  This is the
measurement discipline that re-attributed the round-2 "kernel floor" to
the binner (CLAUDE.md: measure before attributing).

    nohup python tools/probe_stages.py [big_mesh|instanced] > /tmp/probe_stages.log 2>&1 &
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
    which = sys.argv[1] if len(sys.argv) > 1 else "big_mesh"
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    if which == "big_mesh":
        pipe, mesh, uniforms, instances = demos.big_mesh_demo(r, triangles=1_000_000)
    else:
        pipe, mesh, uniforms, instances = demos.DEMOS[which](r)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile

    # Every demo's uniforms fn is traceable (render_sequence contract), so
    # a TRACED time makes all downstream stages differ per scan step.
    uniforms_at = uniforms

    mesh_dev = Mesh(attributes=mesh.attributes, indices=mesh.indices)

    def prefix(depth):
        def body(carry, t_i):
            t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-6
            u = uniforms_at(t)
            attrs, tri_idx = expand_instances(mesh_dev, instances)
            clip, varyings = sh.vertex(attrs, u)
            clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
            if depth == 0:
                return carry + jnp.sum(clip_tri), ()
            ts = setup_triangles(
                clip_tri, W, H, cull_mode=pipe.cull_mode, front_face=pipe.front_face
            )
            if depth == 1:
                return (
                    carry
                    + jnp.sum(ts.bbox.astype(jnp.float32))
                    + jnp.sum(ts.inv_w),
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
                slots=(
                    None
                    if pipe.raster_slots_factor is None
                    else max(int(num_t * pipe.raster_slots_factor), 1024)
                ),
                assemble=pipe.raster_assemble,
            )
            if depth == 2:
                # Feed the REAL kernel but with zeroed tile counts: the
                # binner's outputs get their production layout (a bare
                # jnp.sum checksum lets XLA pick a pathological layout for
                # the record stack — measured 202 ms for a "bin-only"
                # prefix vs 85 ms for the full pipeline), and the kernel
                # does only its per-tile fixed work.  prefix3 - prefix2 is
                # then the kernel's record-processing cost.
                binned = binned._replace(
                    tile_count=jnp.zeros_like(binned.tile_count)
                )
            out = rasterize_binned(
                binned,
                W,
                H,
                tile_w=tile_w,
                tile_h=tile_h,
                depth_clip=pipe.depth.clip,
                num_channels=channels.shape[-1],
                sublane=True,
                sublane_group=pipe.raster_group,
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
            return carry + jnp.sum(color), ()

        return body

    def timed(depth, n1=2, n2=8, reps=3):
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

        a, b = run(n1), run(n2)
        return (b - a) / (n2 - n1)

    names = ["vertex+gather", "+setup", "+bin(zero-count raster)", "+raster(sublane)", "+shade"]
    prev = 0.0
    for d, name in enumerate(names):
        dt = timed(d)
        print(
            f"prefix {d} ({name:18s}): {dt * 1e3:8.2f} ms/frame   "
            f"stage += {(dt - prev) * 1e3:8.2f} ms",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
