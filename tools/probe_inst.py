#!/usr/bin/env python
"""A/B the instanced demo's pipeline knobs on real TPU, one arm per process.

    python tools/probe_inst.py cull       # instance_cull=0.85 (demo default)
    python tools/probe_inst.py nocull     # instance_cull=None
    python tools/probe_inst.py tile16     # raster_tile=(128,16)
    python tools/probe_inst.py group32    # raster_group=32

Each arm must run in a FRESH process (within-process drift, CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARMS = {
    "default": {},
    "cull85": {"instance_cull": 0.85},
    "cull70": {"instance_cull": 0.70},
    "tile16": {"raster_tile": (128, 16)},
    "group16": {"raster_group": 16},
    "group32": {"raster_group": 32},
    "pairs15": {"raster_pairs_factor": 1.5},
    "pallas": {"raster_assemble": "pallas"},
    "slots12": {"raster_slots_factor": 1.2},
    "noclip": "noclip",  # depth.clip=False (geometry never leaves [0,1])
    "combo": "combo",  # stack of the individually-winning knobs
    # Sub-tile band binning on top of the current demo defaults (the
    # demo already stacks noclip+group32+pallas+slots1.2): widen the
    # pair budget for band-crossing records.
    "bin4": {
        "raster_bin_rows": 4,
        "raster_pairs_factor": 3.2,
        "raster_slots_factor": 1.9,
    },
    "bin2": {
        "raster_bin_rows": 2,
        "raster_pairs_factor": 4.5,
        "raster_slots_factor": 3.0,
    },
    # Round-5 attribution arms (probe_stages instanced: 13.8 ms = 6.5
    # bin + 6.4 raster + 0.8 vertex): the binner scales with BUDGETED
    # slots (sort/gather/assembly run over the padded stream), and the
    # demo's budgets (pairs 2.0 / slots 1.2) are ~1.7x looser than
    # big_mesh's measured-tight 1.15/0.7 — so tighten toward the live
    # pair rate (~0.5-0.55 pairs/tri for the backface-culled cube field;
    # overflow is surfaced if an orbit phase exceeds the budget).  The
    # raster side is plausibly per-tile-overhead-bound at ~2k tiles
    # (120k records / 2025 tiles ~ 59/tile), so taller tiles trade fewer
    # tile overheads against more rows evaluated per record.
    "tight": {"raster_pairs_factor": 1.3, "raster_slots_factor": 0.8},
    "tight11": {"raster_pairs_factor": 1.1, "raster_slots_factor": 0.7},
    "tight12": {"raster_pairs_factor": 1.2, "raster_slots_factor": 0.75},
    "tight_s06": {"raster_pairs_factor": 1.2, "raster_slots_factor": 0.6},
    "tile32": {"raster_tile": (128, 32)},
}

# Back-compat names from the round-3 logs (cull was the demo default then).
ARMS["cull"] = ARMS["cull85"]
ARMS["nocull"] = ARMS["default"]
ARMS["nocull_group32"] = ARMS["group32"]


def main():
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    from kernel_probe import time_demo
    from based_renderer_tpu.pipeline import DepthState

    noclip_depth = DepthState(test=True, write=True, compare="less", clip=False)
    ARMS["noclip"] = {"depth": noclip_depth}
    ARMS["combo"] = {
        "depth": noclip_depth,
        "raster_group": 32,
        "raster_assemble": "pallas",
        "raster_slots_factor": 1.2,
    }

    arm = sys.argv[1] if len(sys.argv) > 1 else "default"
    patch = ARMS[arm]
    dt, of = time_demo("instanced", 1920, 1080, 4, 20, patch, count=10_000)
    print(
        f"instanced {arm}: {dt * 1e3:8.3f} ms/frame  overflow={of}", flush=True
    )


if __name__ == "__main__":
    main()
