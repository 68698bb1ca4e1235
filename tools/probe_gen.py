#!/usr/bin/env python
"""Production render_sequence timing for the big_mesh demo on TPU.

    python tools/probe_gen.py [WxH [msaa]]

History: this probe established that the in-program-generated mesh does
NOT match the closure-capture baseline (68.1-68.9 ms/frame vs 53.6-56.3
at 1M tris 1080p, with or without scan-carry threading) — the demo
default reverted to the captured mesh and generation became the opt-in
size/speed trade (demos.big_mesh_demo(generated=True)).  With the
captured default this now times the production bench schedule.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    from kernel_probe import time_demo

    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    msaa = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    W, H = (int(v) for v in size.split("x"))
    n1, n2 = (1, 4) if W > 2560 else (2, 8)
    t0 = time.time()
    dt, of = time_demo("big_mesh", W, H, n1, n2, {}, msaa=msaa, triangles=1_000_000)
    print(
        f"big_mesh {size} msaa{msaa} gen: {dt * 1e3:8.3f} ms/frame "
        f"overflow={of} (wall {time.time() - t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
