#!/usr/bin/env python
"""Attribute the textured-cube frame cost on real TPU.

Times the textured_cube demo under (shade_compact, mip_filter) variants
with the elision-proof schedule, and reports the frame's covered-tile
count so we know which ladder tier actually fires.

    nohup python tools/probe_textured.py > /tmp/probe_textured.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses


def main():
    import numpy as np
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos, geometry
    from based_renderer_tpu.ops import compact as cp
    from based_renderer_tpu.utils import cache
    from kernel_probe import time_demo

    cache.enable_persistent_cache()

    # How many (8,128) tiles does the cube actually cover over a spin?
    r = brt.Renderer(brt.RendererConfig(width=1920, height=1080))
    pipe, mesh, uniforms, _ = demos.textured_cube_demo(r)
    nt = cp.num_tiles(1080, 1920)
    for t in (0.0, 0.4, 0.8, 1.2):
        fr = r.render_frame(pipe, mesh, uniforms(t))
        cov = np.asarray(fr.tri_id) >= 0
        covm = cov.reshape(135, 8, 15, 128).any(axis=(1, 3))
        print(
            f"t={t}: covered px {cov.mean():.3f}, covered tiles "
            f"{covm.sum()}/{nt} ({covm.mean():.3f})",
            flush=True,
        )

    import based_renderer_tpu.models.demos as dm

    variants = [
        ("ladder+linear", {}, "linear"),
        ("none+linear", {"shade_compact": None}, "linear"),
        ("none+nearest", {"shade_compact": None}, "nearest"),
        ("0.375+linear", {"shade_compact": 0.375}, "linear"),
        ("0.5+linear", {"shade_compact": 0.5}, "linear"),
        ("ladder+nearest", {}, "nearest"),
    ]
    orig_upload = brt.Renderer.upload_texture
    for name, patch, mf in variants:
        def upload(self, *a, **kw):
            kw["mip_filter"] = mf
            return orig_upload(self, *a, **kw)

        brt.Renderer.upload_texture = upload
        dt, of = time_demo("textured_cube", 1920, 1080, 8, 40, patch)
        print(f"{name}: {dt * 1e3:.2f} ms/frame overflow={of}", flush=True)
    brt.Renderer.upload_texture = orig_upload


if __name__ == "__main__":
    main()
