#!/usr/bin/env python
"""Per-stage elision-proof attribution of the MSAA-4x cube frame on TPU.

The 12-triangle MSAA cube is pure fixed overhead (raster kernel per-tile
work, per-sample shading, blend/mask, resolve).  Times prefix pipelines
inside per-step-different lax.scan dispatches at two lengths,
differenced — the same discipline as tools/probe_stages.py.

    nohup python tools/probe_msaa.py > /tmp/probe_msaa.log 2>&1 &
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
    from based_renderer_tpu.ops import fixedpoint as fp
    from based_renderer_tpu.renderer import _blend
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    if os.environ.get("BRT_PROBE_CPU"):  # shape-check mode
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        W, H = 256, 128
    else:
        W, H = 1920, 1080
    r = brt.Renderer(brt.RendererConfig(width=W, height=H, msaa=4))
    pipe, mesh, uniforms, _ = demos.DEMOS["cube"](r)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile
    u0 = uniforms(0.0)

    from based_renderer_tpu import math3d

    def uniforms_at(t):
        model = math3d.rotate(t, (0.0, -1.0, 0.0))
        model = math3d.rotate(np.float32(np.radians(-55.0)), (1.0, 0.0, 0.0), model)
        u = dict(u0)
        u["model"] = model
        return u

    mesh_dev = Mesh(attributes=mesh.attributes, indices=mesh.indices)

    def prefix(depth):
        def body(carry, t_i):
            t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-6
            u = uniforms_at(t)
            attrs, tri_idx = expand_instances(mesh_dev, {})
            clip, varyings = sh.vertex(attrs, u)
            clip_tri, var_tri = gather_triangles(clip, varyings, tri_idx)
            ts = setup_triangles(
                clip_tri,
                W,
                H,
                cull_mode=pipe.cull_mode,
                front_face=pipe.front_face,
                bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP,
            )
            if depth == 0:
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
            )
            if depth == 1:
                binned = binned._replace(tile_count=jnp.zeros_like(binned.tile_count))
            out = rasterize_binned(
                binned,
                W,
                H,
                tile_w=tile_w,
                tile_h=tile_h,
                num_channels=channels.shape[-1],
                msaa4=True,
                interpret=bool(os.environ.get("BRT_PROBE_CPU")),
            )
            vis, interp, invw = out
            if depth in (1, 2):
                return (
                    carry
                    + jnp.sum(vis.depth_q.astype(jnp.float32))
                    + jnp.sum(interp[0]),
                    (),
                )
            denom = jnp.where(invw == 0, jnp.float32(1.0), invw)
            iv = interp / denom[None]
            # iv: (C, S, H, W) — mirror renderer.build_frag: slice the
            # channel axis, move it last, vmap the shader over samples.
            frag = {}
            c0 = 0
            for k in var_keys:
                c = var_tri[k].shape[-1]
                frag[k] = jnp.moveaxis(iv[c0 : c0 + c], 0, -1)
                c0 += c
            frag["tri_id"] = vis.tri_id
            frag["depth"] = vis.depth
            frag["bary"] = jnp.stack([vis.b0, vis.b1, vis.b2], axis=-1)
            rgba = jax.vmap(lambda fr: sh.fragment(fr, u))(frag)  # (S, H, W, 4)
            if depth == 3:
                return carry + jnp.sum(rgba), ()
            rgba_p = jnp.transpose(rgba, (0, 3, 1, 2))  # (S, 4, H, W)
            clear = jnp.asarray([0, 0, 0, 1], jnp.float32).reshape(1, 4, 1, 1)
            cur = jnp.broadcast_to(clear, (4, 4, H, W))
            blended = jax.vmap(lambda s_, c_: _blend(s_, c_, pipe.blend))(rgba_p, cur)
            mask = vis.tri_id >= 0
            color = jnp.where(mask[:, None], blended, cur)
            if depth == 4:
                return carry + jnp.sum(color), ()
            resolved = jnp.mean(color, axis=0)
            return carry + jnp.sum(resolved), ()

        return body

    def timed(depth, n1=8, n2=48, reps=3):
        if os.environ.get("BRT_PROBE_CPU"):
            n1, n2, reps = 1, 2, 1
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

    names = [
        "vertex+setup",
        "+bin(zero-count raster)",
        "+raster msaa4",
        "+shade x4",
        "+blend+mask",
        "+resolve",
    ]
    prev = 0.0
    for d, name in enumerate(names):
        dt = timed(d)
        print(
            f"prefix {d} ({name:24s}): {dt * 1e3:8.3f} ms/frame   "
            f"stage += {(dt - prev) * 1e3:8.3f} ms",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
