#!/usr/bin/env python
"""Live (tile, triangle) pair rates for a demo orbit — the budget basis.

The big-mesh/instanced pipelines slice the binner's sorted pair stream at
``raster_slots_factor`` slots/tri and budget extras at
``raster_pairs_factor`` (models/demos.py); those factors must dominate
the WORST per-frame live rate over the demo orbit or the frame overflows
(surfaced, never silent).  This prints those rates, measured with the
same bbox/tile math the binner uses (ops/binning.py pair expansion):

    python tools/count_pairs.py big_mesh [WxH [msaa [frames]]]
    python tools/count_pairs.py instanced 1920x1080 1 64

Counts are exact (one lax.scan over the orbit, device-side); run under
the default TPU env or JAX_PLATFORMS=cpu for small sweeps.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from based_renderer_tpu.utils import cache

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu import shader as shader_lib
    from based_renderer_tpu.ops.vertex import expand_instances, gather_triangles
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.ops import fixedpoint as fp

    which = sys.argv[1] if len(sys.argv) > 1 else "big_mesh"
    size = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
    msaa = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_frames = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    W, H = (int(v) for v in size.split("x"))

    r = brt.Renderer(brt.RendererConfig(width=W, height=H, msaa=msaa))
    kw = {"triangles": 1_000_000} if which == "big_mesh" else (
        {"count": 10_000} if which == "instanced" else {}
    )
    pipe, mesh, uniforms, instances = demos.DEMOS[which](r, **kw)
    sh = shader_lib.get(pipe.shader)
    tile_w, tile_h = pipe.raster_tile
    # coverage MSAA rasterizes at 1x with padded bboxes (no resolution scale)
    pad = fp.MSAA4_BBOX_PAD_FP if msaa == 4 else 0

    def counts_at(t):
        u = uniforms(t)
        attrs, tri_idx = expand_instances(mesh, instances)
        clip, _ = sh.vertex(attrs, u)
        clip_tri, _ = gather_triangles(clip, {}, tri_idx)
        ts = setup_triangles(
            clip_tri, W, H, cull_mode=pipe.cull_mode,
            front_face=pipe.front_face, bbox_pad_fp=pad,
        )
        bx0 = jnp.maximum(ts.bbox[:, 0], 0)
        by0 = jnp.maximum(ts.bbox[:, 1], 0)
        bx1 = jnp.minimum(ts.bbox[:, 2], W)
        by1 = jnp.minimum(ts.bbox[:, 3], H)
        live = ts.valid & (bx1 > bx0) & (by1 > by0)
        bw = jnp.where(live, (bx1 - 1) // tile_w - bx0 // tile_w + 1, 0)
        bh = jnp.where(live, (by1 - 1) // tile_h - by0 // tile_h + 1, 0)
        k = bw * bh
        pairs = jnp.sum(k)
        extras = jnp.sum(jnp.maximum(k - 1, 0))
        return pairs, extras, jnp.sum(live.astype(jnp.int32))

    T = mesh.num_triangles * (
        next(iter(instances.values())).shape[0] if instances else 1
    )

    def body(carry, i):
        p, e, l = counts_at(0.016 * i.astype(jnp.float32))
        return carry, jnp.stack([p, e, l])

    _, out = jax.jit(
        lambda idx: jax.lax.scan(body, 0, idx)
    )(jnp.arange(n_frames, dtype=jnp.int32))
    out = np.asarray(out)
    pairs, extras, live = out[:, 0], out[:, 1], out[:, 2]
    print(
        f"{which} {size} msaa{msaa} T={T}: frames={n_frames}\n"
        f"  pairs/tri   worst {pairs.max() / T:.4f}  mean {pairs.mean() / T:.4f}"
        f"  (slots_factor must exceed worst)\n"
        f"  extras/tri  worst {extras.max() / T:.4f}"
        f"  (pairs_factor must exceed 1 + worst)\n"
        f"  live tris   worst {live.max() / T:.4f}  mean {live.mean() / T:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
