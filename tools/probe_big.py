#!/usr/bin/env python
"""A/B the big_mesh demo's pipeline knobs on real TPU, one arm per process.

    python tools/probe_big.py default|group64|noclip|combo [WxH [msaa]]

Each arm must run in a FRESH process (within-process drift, CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    from kernel_probe import time_demo
    from based_renderer_tpu.pipeline import DepthState

    noclip_depth = DepthState(test=True, write=True, compare="less", clip=False)
    arms = {
        "default": {},
        "group64": {"raster_group": 64},
        "group16": {"raster_group": 16},
        # Round-5: G=128 spans 16 VPU registers per op — amortizes the
        # per-group (G, 1) coefficient loads and loop control further
        # than the measured group64 winner (CHUNK % 128 == 0 holds).
        "group128": {"raster_group": 128},
        # The procedural mesh never leaves the depth window (the demo
        # already skips the near clipper on the same grounds), so the
        # per-fragment depth clip can be dropped: the sublane kernels'
        # late_bias path then removes the clip-window ops from the pass-1
        # hot loop.  Image-identical when nothing clips (asserted by the
        # checksum cross-check in tests/test_renderer.py).
        "noclip": {"depth": noclip_depth},
        "combo": {"depth": noclip_depth, "raster_group": 64},
        # Sub-tile band binning (Pipeline.raster_bin_rows): records bin
        # per (128 x bin_rows) band, the sublane kernel evaluates only
        # the band's rows.  Pairs/tri roughly scale with the number of
        # bands a tiny triangle's bbox crosses, so widen both budgets.
        "bin4": {
            "raster_bin_rows": 4,
            "raster_pairs_factor": 1.8,
            "raster_slots_factor": 1.1,
        },
        "bin2": {
            "raster_bin_rows": 2,
            "raster_pairs_factor": 2.6,
            "raster_slots_factor": 1.7,
        },
        "bin4g32": {
            "raster_bin_rows": 4,
            "raster_pairs_factor": 1.8,
            "raster_slots_factor": 1.1,
            "raster_group": 32,
        },
        # Round-5 binner-dominance follow-up (stage split: 34.5 of
        # 53.6 ms is binner; gather + assembly scale with the slot
        # budget): tighten slots toward the worst measured live rate
        # (0.560 pairs/tri at 1080p, tools/count_pairs.py).  Overflow is
        # surfaced — an arm that overflows is invalid, not fast.
        "slots065": {"raster_slots_factor": 0.65},
        "slots06": {"raster_slots_factor": 0.6},
        # The pair-expansion/sort stream is max_pairs = pairs_factor*T;
        # extras (multi-tile pairs) are rare on this mesh.
        "pairs105": {"raster_pairs_factor": 1.05, "raster_slots_factor": 0.65},
        # 4K tier (run with: probe_big.py slots09 3840x2160 4): worst
        # measured 0.842 pairs/tri at 4K MSAA -> 0.9 keeps ~6.9% headroom.
        "slots09": {"raster_slots_factor": 0.9},
        # Round-5 template-layout arm: field-major build + tiled Pallas
        # transpose (ops/binassem.transpose_templates) instead of the
        # stack(axis=-1) lane-interleave (~12.7 ms of the binner,
        # tools/probe_binner3.py tmpl_cur).  MEASURED DEAD END (same-hour
        # v5e A/B): tmplp 53.769 vs default 52.092 ms — the standalone
        # interleave cost does not materialize in the full frame.
        "tmplp": {"raster_tmpl": "pallas"},
    }
    arm = sys.argv[1] if len(sys.argv) > 1 else "default"
    size = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
    msaa = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    W, H = (int(v) for v in size.split("x"))
    n1, n2 = (1, 4) if W > 2560 else (2, 8)
    dt, of = time_demo(
        "big_mesh", W, H, n1, n2, arms[arm], msaa=msaa, triangles=1_000_000
    )
    print(
        f"big_mesh {size} msaa{msaa} {arm}: {dt * 1e3:8.3f} ms/frame  overflow={of}",
        flush=True,
    )


if __name__ == "__main__":
    main()
