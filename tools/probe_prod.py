#!/usr/bin/env python
"""Attribute the production-frame vs probe-pipeline gap on big_mesh (real TPU).

probe_stages.py measures the hand-rolled prefix pipeline at ~61 ms/frame
while render_sequence measures ~77.5 — this times the PRODUCTION frame
program (renderer._build_program, the exact function render_sequence
scans) with different consumed outputs, so XLA dead-code-eliminates the
rest:

    vis-only   : sum(depth_q)            -> shade/blend/composite DCE'd
    color      : sum(color)              -> the full production frame
    color+vis  : sum(color) + sum(depth_q)

    nohup python tools/probe_prod.py > /tmp/probe_prod.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()

    W, H = 1920, 1080
    TRIS = 1_000_000
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=TRIS)

    r.begin_frame()
    r.draw(pipe, mesh, uniforms(0.0))
    draws = r._draws
    r._draws, r._in_frame = [], False
    single = r._build_program(draws, 1.0, jit=False)
    dyn0 = r._dynamic_args(draws)

    def uniforms_at(t):
        c, s = jnp.cos(t * 0.5), jnp.sin(t * 0.5)
        rot = jnp.asarray(
            [[c, 0.0, s, 0.0], [0.0, 1.0, 0.0, 0.0], [-s, 0.0, c, 0.0], [0.0, 0.0, 0.0, 1.0]],
            jnp.float32,
        )
        u = dict(dyn0[0]["uniforms"])
        u["model"] = rot
        return u

    clear_color = jnp.asarray((0.0, 0.0, 0.0, 0.0), jnp.float32)

    def body_for(consume):
        def body(carry, t_i):
            t = t_i.astype(jnp.float32) * 0.016 + carry * 1e-6
            d = dict(dyn0[0])
            d["uniforms"] = uniforms_at(t)
            color, depth_q, tri_id, stencil, of = single([d], clear_color)
            out = jnp.float32(0.0)
            if "color" in consume:
                out = out + jnp.sum(color)
            if "vis" in consume:
                out = out + jnp.sum(depth_q.astype(jnp.float32))
            if "of" in consume:
                out = out + of.astype(jnp.float32)
            return carry + out, ()

        return body

    def timed(name, body, n1=2, n2=8, reps=3):
        def run(n):
            @jax.jit
            def prog(c0):
                c, _ = jax.lax.scan(body, c0, jnp.arange(n, dtype=jnp.int32))
                return c

            np.asarray(prog(jnp.float32(1.0)))
            best = 1e9
            for k in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(jnp.float32(1.0 + 1e-3 * k)))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (run(n2) - run(n1)) / (n2 - n1)
        print(f"{name}: {dt * 1e3:8.2f} ms/frame", flush=True)

    timed("vis-only (shade DCE'd)", body_for({"vis"}))
    timed("color    (full frame) ", body_for({"color"}))
    timed("color+of (bench path) ", body_for({"color", "of"}))

    # The EXACT render_sequence entry point at two lengths, differenced —
    # whatever this shows above the color leg lives in render_sequence's
    # own structure (stacked-uniform slicing, checksum stacking, overflow
    # carry), not the frame program.
    def uniform_stack(n):
        ts = [uniforms_at(jnp.float32(i * 0.016)) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ts)

    def rs(n):
        out = r.render_sequence(pipe, mesh, uniform_stack(n))
        np.asarray(out)

    for rep in range(2):
        rs(2)
    best = {}
    for n in (2, 8):
        b = 1e9
        for rep in range(3):
            t0 = time.perf_counter()
            rs(n)
            b = min(b, time.perf_counter() - t0)
        best[n] = b
    print(
        f"render_sequence       : {(best[8] - best[2]) / 6 * 1e3:8.2f} ms/frame",
        flush=True,
    )


if __name__ == "__main__":
    main()
