#!/usr/bin/env python
"""Fresh-process MSAA-4x cube timing against an arbitrary repo checkout.

    python tools/probe_msaa_ab.py /path/to/tree [label]

Times the msaa4 cube exactly like bench.py (render_sequence at two
lengths, differenced, phase-shifted reps) but with the package imported
from the given tree — lets round-N snapshots (git worktrees) be A/B'd
under today's environment.  One arm per process (within-process drift).
"""

import os
import sys
import time


def main():
    tree = os.path.abspath(sys.argv[1])
    label = sys.argv[2] if len(sys.argv) > 2 else tree
    sys.path.insert(0, tree)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt

    assert brt.__file__.startswith(tree), brt.__file__
    from based_renderer_tpu.models import demos

    try:
        from based_renderer_tpu.utils import cache

        cache.enable_persistent_cache()
    except Exception:
        pass

    r = brt.Renderer(brt.RendererConfig(width=1920, height=1080, msaa=4))
    pipe, mesh, uniforms, _ = demos.DEMOS["cube"](r)

    def time_sequence(n_frames, reps=3):
        def make_useq(phase):
            return jax.block_until_ready(
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[uniforms(phase + 0.016 * i) for i in range(n_frames)],
                )
            )

        seqs = [make_useq(1e-3 * (k + 1)) for k in range(reps + 1)]
        sums = r.render_sequence(pipe, mesh, seqs[-1])
        np.asarray(sums)
        best = float("inf")
        for k in range(reps):
            t0 = time.perf_counter()
            s = np.asarray(r.render_sequence(pipe, mesh, seqs[k]))
            best = min(best, time.perf_counter() - t0)
        assert len(set(np.round(s, 1))) > min(5, n_frames // 4)
        return best

    a, b = time_sequence(16), time_sequence(96)
    ms = (b - a) / 80 * 1e3
    print(f"{label}: msaa4 cube {ms:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
