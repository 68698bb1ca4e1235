#!/usr/bin/env python
"""Compiled-Mosaic bit-identity check of the sublane MSAA kernel (real TPU).

Renders a random MSAA-4x scene with channels through both the sequential
and the sublane MSAA kernels on the real device and asserts per-sample
tri_id/depth/attribute equality (the interpret-mode suite cannot catch
Mosaic lowering bugs: 4D VMEM refs, lane-concat one-hots, iota&127).

    nohup python tools/check_msaa_sublane_tpu.py > /tmp/check_msaa_sub_tpu.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax.numpy as jnp

    from based_renderer_tpu.ops import fixedpoint as fp
    from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    W, H = 256, 64
    rng = np.random.default_rng(11)
    n = 70
    v = rng.uniform(-1.2, 1.2, (n, 3, 4)).astype(np.float32)
    v[..., 2] = rng.uniform(0.0, 1.0, (n, 3))
    v[..., 3] = 1.0
    v = np.concatenate([v, np.repeat(v[:5], 3, axis=0)])  # exact-tie groups
    clip = jnp.asarray(v)
    ch = jnp.asarray(rng.uniform(0, 1, (len(v), 3, 5)).astype(np.float32))
    ts = setup_triangles(clip, W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP)
    kw = dict(tile_w=128, tile_h=8, channels=ch, msaa4=True, max_pairs=8192)
    for compare in ("less", "less_equal"):
        seq = rasterize_vis_pallas(ts, W, H, depth_compare=compare, **kw)
        for group in (8, 32):
            sub = rasterize_vis_pallas(
                ts,
                W,
                H,
                depth_compare=compare,
                sublane=True,
                sublane_group=group,
                **kw,
            )
            pairs = [
                (seq[0].tri_id, sub[0].tri_id, "tri_id"),
                (seq[0].depth_q, sub[0].depth_q, "depth_q"),
                (seq[0].b0, sub[0].b0, "b0"),
                (seq[0].b2, sub[0].b2, "b2"),
                (seq[1], sub[1], "interp"),
                (seq[2], sub[2], "invw"),
            ]
            for a, b, nm in pairs:
                a, b = np.asarray(a), np.asarray(b)
                if not (a == b).all():
                    print(
                        f"FAIL {compare} group={group} {nm}: "
                        f"{(a != b).sum()} of {a.size} differ"
                    )
                    sys.exit(1)
            print(f"OK {compare} group={group}", flush=True)
    cov = int((np.asarray(seq[0].tri_id) >= 0).sum())
    print(f"PASS compiled-Mosaic MSAA sublane bit-identity (covered={cov})")


if __name__ == "__main__":
    main()
