#!/usr/bin/env python
"""Probe raster-kernel perf variants on the real TPU.

Times demo frames under pipeline overrides (tile size, loser skipping,
pair budget) using the same elision-proof schedule as bench.py: N
distinct frames in one render_sequence dispatch, timed at two lengths
and differenced.

    nohup python tools/kernel_probe.py --demo big_mesh \
        --tiles 128x32,128x16,128x8 > /tmp/probe.log 2>&1 &
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_demo(name, width, height, n1, n2, pipe_patch, msaa=1, **dkw):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu.scene import Texture

    cfg = brt.RendererConfig(width=width, height=height, msaa=msaa)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, inst = demos.DEMOS[name](r, **dkw)
    pipe = dataclasses.replace(pipe, **pipe_patch)
    u0 = uniforms(0.0)
    static = {k: v for k, v in u0.items() if isinstance(v, Texture)}

    def strip(u):
        return {k: v for k, v in u.items() if k not in static}

    def run(n):
        def make_useq(phase):
            if not strip(u0):
                return {}
            return jax.block_until_ready(
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[strip(uniforms(phase + 0.016 * i)) for i in range(n)],
                )
            )

        # One sequence per dispatch: the tunnel elides repeated identical
        # dispatches, so reusing inputs under-reports.
        kw = dict(instances=inst, num_frames=n, static_uniforms=static)
        np.asarray(r.render_sequence(pipe, mesh, make_useq(0.9), **kw))
        best = 1e9
        for k in range(2):
            useq = make_useq(1e-3 * (k + 1))
            t0 = time.perf_counter()
            np.asarray(r.render_sequence(pipe, mesh, useq, **kw))
            best = min(best, time.perf_counter() - t0)
        return best

    a, b = run(n1), run(n2)
    dt = (b - a) / (n2 - n1)
    of = bool(np.asarray(r.last_sequence_overflowed))
    return dt, of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", default="big_mesh")
    ap.add_argument("--tiles", default="128x32,128x16,128x8")
    ap.add_argument("--skip-losers", default="keep", choices=["keep", "both", "on", "off"])
    ap.add_argument("--two-pass", default="keep", choices=["keep", "both", "on", "off"])
    ap.add_argument("--batch", default="keep", help='"keep" or comma list of sizes (0=sequential)')
    ap.add_argument("--unroll", default="keep", help='"keep" or comma list of unroll factors')
    ap.add_argument("--sublane", default="keep", choices=["keep", "both", "on", "off"])
    ap.add_argument("--n1", type=int, default=2)
    ap.add_argument("--n2", type=int, default=6)
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--msaa", type=int, default=1)
    args = ap.parse_args()

    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    W, H = (int(v) for v in args.size.split("x"))

    for tile in args.tiles.split(","):
        tw, th = (int(v) for v in tile.split("x"))
        if args.skip_losers == "both":
            skips = [False, True]
        elif args.skip_losers == "keep":
            skips = [None]
        else:
            skips = [args.skip_losers == "on"]
        if args.two_pass == "both":
            twos = [False, True]
        elif args.two_pass == "keep":
            twos = [None]
        else:
            twos = [args.two_pass == "on"]
        batches = [None] if args.batch == "keep" else [int(v) for v in args.batch.split(",")]
        unrolls = [None] if args.unroll == "keep" else [int(v) for v in args.unroll.split(",")]
        if args.sublane == "both":
            subls = [False, True]
        elif args.sublane == "keep":
            subls = [None]
        else:
            subls = [args.sublane == "on"]
        for sk in skips:
            for tp in twos:
                for bt in batches:
                    for un in unrolls:
                        for sl in subls:
                            patch = {"raster_tile": (tw, th)}
                            if sk is not None:
                                patch["raster_skip_losers"] = sk
                            if tp is not None:
                                patch["raster_two_pass"] = tp
                            if bt is not None:
                                patch["raster_batch"] = bt
                            if un is not None:
                                patch["raster_unroll"] = un
                            if sl is not None:
                                patch["raster_sublane"] = sl
                            t0 = time.time()
                            dt, of = time_demo(
                                args.demo, W, H, args.n1, args.n2, patch, msaa=args.msaa
                            )
                            print(
                                f"{args.demo} {W}x{H} tile={tw}x{th} skip={sk} two_pass={tp} "
                                f"batch={bt} unroll={un} sublane={sl}: "
                                f"{dt * 1e3:9.3f} ms/frame = {1 / dt:8.1f} fps  "
                                f"overflow={of}  (wall {time.time() - t0:.0f}s)",
                                flush=True,
                            )


if __name__ == "__main__":
    main()
