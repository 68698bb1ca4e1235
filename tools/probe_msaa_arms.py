#!/usr/bin/env python
"""MSAA-4x kernel-variant arms for the cube and big-mesh workloads on TPU.

The MSAA cube regressed 1.03 ms (round 2) -> 1.33 ms (round 4) while the
sublane-MSAA accumulator variant won the 4K big-mesh bar — the round-4
verdict asks for a per-workload static choice.  These arms time each
candidate under the bench schedule, one arm per process:

    python tools/probe_msaa_arms.py default          # demo default
    python tools/probe_msaa_arms.py sublane          # sublane MSAA kernel
    python tools/probe_msaa_arms.py sublane16        #   + group 16
    python tools/probe_msaa_arms.py big_default 3840x2160   # 4K big mesh
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    from kernel_probe import time_demo

    arm = sys.argv[1] if len(sys.argv) > 1 else "default"
    size = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
    W, H = (int(v) for v in size.split("x"))

    cube_arms = {
        "default": {},
        "sublane": {"raster_sublane": True, "raster_tile": (128, 8)},
        "sublane16": {
            "raster_sublane": True,
            "raster_tile": (128, 8),
            "raster_group": 16,
        },
        "batch8": {"raster_batch": 8},
    }
    if arm.startswith("big_"):
        sub = arm[4:]
        big_arms = {
            "default": {},
            "seq": {"raster_sublane": False},  # sequential MSAA kernel
            "group32": {"raster_group": 32},
        }
        n1, n2 = (1, 4) if W > 2560 else (2, 8)
        dt, of = time_demo(
            "big_mesh", W, H, n1, n2, big_arms[sub], msaa=4,
            triangles=1_000_000,
        )
        print(
            f"big_mesh {size} msaa4 {sub}: {dt * 1e3:8.3f} ms/frame "
            f"overflow={of}",
            flush=True,
        )
        return
    dt, of = time_demo("cube", W, H, 16, 96, cube_arms[arm], msaa=4)
    print(
        f"cube {size} msaa4 {arm}: {dt * 1e3:8.3f} ms/frame overflow={of}",
        flush=True,
    )


if __name__ == "__main__":
    main()
