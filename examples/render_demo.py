#!/usr/bin/env python
"""Demo driver: the frame-loop application (the WinMain analog).

Runs one of the built-in demos for N frames with double-buffered present
and FPS reporting — the TPU equivalent of the reference's
record/submit/present loop (/root/reference/src/main.cpp:1876-2187), with
the native C++ present ring writing PNG frames when requested.

    python examples/render_demo.py cube --frames 120 --width 1920 --height 1080
    python examples/render_demo.py textured_cube --out /tmp/frames
    python examples/render_demo.py --list
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("demo", nargs="?", default="cube")
    ap.add_argument("--list", action="store_true", help="list demos and exit")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--msaa", type=int, default=1, choices=(1, 4))
    ap.add_argument("--out", default=None, help="directory for PNG frames")
    ap.add_argument("--vsync", action="store_true", help="pace at fixed_dt")
    ap.add_argument("--srgb", action="store_true",
                    help="present through the sRGB transfer function "
                         "(the *_SRGB swapchain-format analog)")
    ap.add_argument("--backend", default="auto", choices=("auto", "xla", "pallas"))
    ap.add_argument("--profile", action="store_true",
                    help="fence + time render/present stages (StageTimer)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the run "
                         "into DIR (view in TensorBoard/Perfetto)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu import present, runtime
    from based_renderer_tpu.utils.errors import main_guard
    from based_renderer_tpu.utils import profiling
    from based_renderer_tpu.utils.profiling import StageTimer

    if args.list:
        print("\n".join(demos.DEMOS))
        return

    def run():
        cfg = brt.RendererConfig(
            width=args.width, height=args.height, msaa=args.msaa,
            raster_backend=args.backend, framebuffer_srgb=args.srgb,
        )
        r = brt.Renderer(cfg)
        demo = demos.DEMOS[args.demo](r)
        if args.out:
            os.makedirs(args.out, exist_ok=True)

        ring = None
        if runtime.available():
            ring = runtime.PresentRing(
                cfg.width, cfg.height, depth=2, out_dir=args.out,
                srgb=cfg.framebuffer_srgb,
            )

        def on_frame(img, pacer):
            if ring is not None:
                ring.submit(img)
            elif args.out:
                brt.image.write_png(
                    os.path.join(args.out, f"frame_{pacer.t:08.3f}.png"), img,
                    srgb=cfg.framebuffer_srgb,
                )

        timer = StageTimer() if args.profile else None
        import contextlib

        trace_cm = (
            profiling.trace(args.trace) if args.trace else contextlib.nullcontext()
        )
        with trace_cm:
            last, pacer = present.render_loop(
                r, demo, frames=args.frames, on_frame=on_frame, vsync=args.vsync,
                timer=timer,
            )
        if args.trace:
            print(f"device trace written to {args.trace}")
        if ring is not None:
            ring.flush()
            ring.close()
        print(
            f"{args.demo}: {args.frames} frames at {cfg.width}x{cfg.height} "
            f"msaa={cfg.msaa} -> {pacer.fps:.1f} fps"
        )
        if timer is not None:
            print(timer.report())

    main_guard(run)


if __name__ == "__main__":
    main()
