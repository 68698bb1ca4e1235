#!/usr/bin/env python
"""Measure tile-compaction primitive costs on the real TPU.

Covered-pixel-compacted shading (VERDICT r2 task 2) stands on four
primitives; this probe prices each at 1080p scale so the design is
built on measured numbers, not guesses:

  A. layout: (C, H, W) planar framebuffer -> (ntiles, th*tw*C) tile rows
  B. pick:   per-tile coverage reduce + 2k-element sort + slice
  C. gather: K covered tile rows out of the tile-row matrix
  D. scatter: K shaded tile rows back into a full framebuffer
  E. tap:    flat texture gather at full-screen vs compacted pixel count

Method: per-step-different work inside one lax.scan dispatch, fetched
checksums, timed at two scan lengths and differenced (the only honest
timing on the axon tunnel — see CLAUDE.md).

    nohup python tools/probe_compact.py > /tmp/probe_compact.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1080, 1920
TH, TW = 8, 128
NTY, NTX = H // TH, W // TW
NT = NTY * NTX  # 2025 tiles


def timed_scan(body, n1=8, n2=40, reps=3):
    """Time `body(carry, tick) -> (carry, ())` over a scan, differenced."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def run(n):
        @jax.jit
        def prog(c0):
            c, _ = jax.lax.scan(body, c0, jnp.arange(n, dtype=jnp.int32))
            return jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32)), c
            )

        c0 = jnp.float32(1.0)
        np.asarray(jax.tree.leaves(prog(c0)))  # compile
        best = 1e9
        for k in range(reps):
            c0 = jnp.float32(1.0 + 1e-3 * k)
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(prog(c0)))
            best = min(best, time.perf_counter() - t0)
        return best

    a, b = run(n1), run(n2)
    return (b - a) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    def report(name, dt):
        print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)

    # --- A. planar -> tile-row layout (C=8 f32 planes) -------------------
    planes = jax.random.normal(key, (8, H, W), jnp.float32)

    def a_body(c, t):
        p = planes + c + t.astype(jnp.float32)
        tiles = (
            p.reshape(8, NTY, TH, NTX, TW)
            .transpose(1, 3, 2, 4, 0)
            .reshape(NT, TH * TW * 8)
        )
        return c + jnp.sum(tiles), ()

    report("A: planar(8,H,W) -> tile rows", timed_scan(a_body))

    # --- B. coverage reduce + sort + slice -------------------------------
    tri_id = jax.random.randint(key, (H, W), -1, 3, jnp.int32)

    def b_body(c, t):
        tid = tri_id + t
        cov = (
            tid.reshape(NTY, TH, NTX, TW).max(axis=(1, 3)) >= 0
        ).reshape(NT)
        keyv = jnp.where(cov, jnp.arange(NT, dtype=jnp.int32), jnp.int32(1 << 20) + jnp.arange(NT, dtype=jnp.int32))
        order = jax.lax.sort(keyv)
        k = jnp.sum(cov.astype(jnp.int32))
        return c + order[0].astype(jnp.float32) + k.astype(jnp.float32), ()

    report("B: per-tile coverage + 2k sort", timed_scan(b_body))

    # --- C. gather K tile rows (K = 512, row width 1024*C) ---------------
    for ccols in (1, 4, 8):
        rows = jax.random.normal(key, (NT, TH * TW * ccols), jnp.float32)
        idx = jnp.arange(512, dtype=jnp.int32) * 3 % NT

        def c_body(c, t, rows=rows, idx=idx):
            g = rows[(idx + t) % NT]
            return c + jnp.sum(g), ()

        report(f"C: gather 512 tile rows (C={ccols})", timed_scan(c_body))

    # --- D. scatter 512 tile rows back -----------------------------------
    shaded = jax.random.normal(key, (512, TH * TW * 4), jnp.float32)
    idx = jnp.arange(512, dtype=jnp.int32) * 3 % NT

    def d_body(c, t):
        out = jnp.zeros((NT, TH * TW * 4), jnp.float32)
        out = out.at[(idx + t) % NT].set(shaded + c)
        return c + jnp.sum(out), ()

    report("D: scatter 512 tile rows", timed_scan(d_body))

    # --- D2. full inverse layout: tile rows -> planar --------------------
    full = jax.random.normal(key, (NT, TH * TW * 4), jnp.float32)

    def d2_body(c, t):
        img = (
            (full + c + t.astype(jnp.float32))
            .reshape(NTY, NTX, TH, TW, 4)
            .transpose(4, 0, 2, 1, 3)
            .reshape(4, H, W)
        )
        return c + jnp.sum(img), ()

    report("D2: tile rows -> planar(4,H,W)", timed_scan(d2_body))

    # --- E. flat texture-tap gather at three pixel counts ----------------
    tex = jax.random.normal(key, (256 * 256, 16), jnp.float32)
    for m in (H * W, 512 * 1024, 256 * 1024):
        uv = jax.random.randint(key, (m,), 0, 256 * 256, jnp.int32)

        def e_body(c, t, uv=uv):
            g = tex[(uv + t) % (256 * 256)]
            return c + jnp.sum(g), ()

        report(f"E: flat tap gather {m // 1024}k px (16 cols)", timed_scan(e_body))


if __name__ == "__main__":
    main()
