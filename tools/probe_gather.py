#!/usr/bin/env python
"""Row-gather width/split strategies at binner shapes (real TPU).

The binner's fused template gather (0.7M random rows from a 1M x 64 int32
table) is its dominant cost (~19 ms measured via probe_binner.py).  The
round-2 lore says narrow (<=24) row gathers are ~2x cheaper per row than
64-wide ones; this probe times split strategies at the production shape:

    one 64-wide | two 24-wide (47 cols split) | three 16-wide | one 128-wide
    | two 32-wide | dynamic-slice contiguous copy (floor reference)

Elision-proof: per-step different indices inside a lax.scan, two lengths,
differenced.

    nohup python tools/probe_gather.py > /tmp/probe_gather.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    ROWS = 1_000_000  # template table rows (triangles)
    NGATHER = 700_032  # gathered rows (slot budget)

    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (ROWS, 128), 0, 1 << 20, dtype=jnp.int32)
    table = jax.device_put(table)
    base_idx = jax.random.randint(key, (NGATHER,), 0, ROWS, dtype=jnp.int32)

    def timed(name, body, n1=2, n2=8, reps=3):
        def run(n):
            @jax.jit
            def prog(c0):
                def step(c, i):
                    idx = (base_idx + i * 7919 + c.astype(jnp.int32)) % ROWS
                    return body(idx, c), ()

                c, _ = jax.lax.scan(step, c0, jnp.arange(n, dtype=jnp.int32))
                return c

            np.asarray(prog(jnp.int32(1)))
            best = 1e9
            for k in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(jnp.int32(1 + k)))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (run(n2) - run(n1)) / (n2 - n1)
        print(f"{name}: {dt * 1e3:8.2f} ms", flush=True)

    def checksum(g, c):
        gb = jax.lax.optimization_barrier(g)
        return c + jnp.sum(gb[::129, 0]) + jnp.sum(gb[::513, -1])

    def one_width(w):
        def body(idx, c):
            sub = jax.lax.optimization_barrier(table[:, :w])
            return checksum(sub[idx], c)

        return body

    def split(widths):
        offs = np.cumsum([0] + list(widths))

        def body(idx, c):
            acc = c
            for o, w in zip(offs, widths):
                sub = jax.lax.optimization_barrier(
                    jax.lax.dynamic_slice_in_dim(table, int(o), w, axis=1)
                )
                acc = checksum(sub[idx], acc)
            return acc

        return body

    def contiguous(w):
        # Floor reference: same bytes, contiguous rows (no index scatter).
        def body(idx, c):
            sub = jax.lax.optimization_barrier(table[:, :w])
            g = jax.lax.dynamic_slice_in_dim(
                sub, jnp.sum(idx[:1]) % 16, NGATHER, axis=0
            )
            return checksum(g, c)

        return body

    timed("gather 1x64      ", one_width(64))
    timed("gather 2x24(=48) ", split([24, 24]))
    timed("gather 3x16(=48) ", split([16, 16, 16]))
    timed("gather 2x32(=64) ", split([32, 32]))
    timed("gather 1x128     ", one_width(128))
    timed("gather 1x48      ", one_width(48))
    timed("gather 2x64(=128)", split([64, 64]))
    timed("contig  1x64     ", contiguous(64))


if __name__ == "__main__":
    main()
