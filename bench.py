#!/usr/bin/env python
"""Benchmark: the 1080p spinning-cube demo on one TPU chip.

Measures steady-state frames/second of the flagship demo (BASELINE.md
config 2: per-vertex color + depth test at 1920x1080) with double-buffered
async dispatch, excluding compilation.  Prints ONE JSON line:

    {"metric": "cube_1080p_fps", "value": N, "unit": "fps", "vs_baseline": N/1000}

vs_baseline is against the BASELINE.json north-star target of 1000 FPS
(>2 Gpixel/s shaded).  The reference itself publishes no numbers and is
vsync-locked to the monitor refresh rate (BASELINE.md).
"""

import json
import sys
import time

import jax
import numpy as np


def main():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    width, height = 1920, 1080
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    r = brt.Renderer(brt.RendererConfig(width=width, height=height))
    pipe, mesh, uniforms, inst = demos.cube_demo(r)

    # Pre-materialize per-frame uniforms so host-side matrix math is not
    # part of the measured loop (the reference's rotate_cube runs on the
    # host too, but we measure device throughput).
    us = [jax.tree.map(jax.block_until_ready, uniforms(0.016 * i)) for i in range(frames)]

    # Warmup / compile.
    f = r.render_frame(pipe, mesh, us[0], instances=inst)
    jax.block_until_ready(f.color)
    for u in us[:3]:
        f = r.render_frame(pipe, mesh, u, instances=inst)
    jax.block_until_ready(f.color)

    t0 = time.perf_counter()
    last = None
    for u in us:
        last = r.render_frame(pipe, mesh, u, instances=inst)
    jax.block_until_ready(last.color)
    dt = time.perf_counter() - t0

    fps = frames / dt
    mpix = fps * width * height / 1e6
    result = {
        "metric": "cube_1080p_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 1000.0, 4),
        "extra": {
            "mpixel_per_s": round(mpix, 1),
            "frames": frames,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
