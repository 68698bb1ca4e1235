#!/usr/bin/env python
"""Quick A/B of pipeline-knob overrides on a bench config (real TPU).

    nohup python tools/quick_ab.py big_mesh 1920 1080 1 "{}" "{'raster_assemble':'pallas'}" \
        > /tmp/quick_ab.log 2>&1 &

Each positional override dict is applied to the demo's pipeline with
dataclasses.replace and timed with bench.py's elision-proof two-length
sequence method.
"""

import ast
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu.scene import Texture
    from based_renderer_tpu.utils import cache
    from bench import time_sequence

    cache.enable_persistent_cache()

    demo = sys.argv[1]
    w, h, msaa = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    overrides = [ast.literal_eval(a) for a in sys.argv[5:]]
    dkw = {"triangles": 1_000_000} if demo == "big_mesh" else (
        {"count": 10_000} if demo == "instanced" else {}
    )
    frames = (2, 8) if (w > 2000 or demo == "big_mesh") else (8, 40)
    if msaa == 4 and w > 2000:
        frames = (1, 4)

    r = brt.Renderer(brt.RendererConfig(width=w, height=h, msaa=msaa))
    pipe0, mesh, uniforms, inst = demos.DEMOS[demo](r, **dkw)
    u0 = uniforms(0.0)
    static = {k: v for k, v in u0.items() if isinstance(v, Texture)}

    def dyn_uniforms(t):
        return {k: v for k, v in uniforms(t).items() if k not in static}

    for ov in overrides:
        flat = {k: v for k, v in ov.items() if "." not in k}
        pipe = dataclasses.replace(pipe0, **flat)
        for k, v in ov.items():
            if "." in k:  # nested dataclass field, e.g. "depth.clip"
                outer, inner = k.split(".", 1)
                sub = dataclasses.replace(getattr(pipe, outer), **{inner: v})
                pipe = dataclasses.replace(pipe, **{outer: sub})
        t_small = time_sequence(r, pipe, mesh, dyn_uniforms, static, frames[0], inst)
        t_big = time_sequence(r, pipe, mesh, dyn_uniforms, static, frames[1], inst)
        ms = (t_big - t_small) / (frames[1] - frames[0]) * 1e3
        print(f"{demo} {w}x{h} msaa{msaa} {ov}: {ms:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
