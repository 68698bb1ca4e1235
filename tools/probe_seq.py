#!/usr/bin/env python
"""Bisect the render_sequence vs direct-scan gap on big_mesh (real TPU).

probe_prod.py measured the production frame program at ~55.5 ms/frame when
scanned directly but ~73-90 ms/frame through Renderer.render_sequence.
Both are lax.scan over the SAME single-frame program, so the gap must
live in one of render_sequence's structural choices. This times each in
isolation (n=2 vs n=8 differenced, best of 3, phase-shifted):

    direct   : probe-style — dyn closure-captured, uniforms computed
               in-body from the tick, checksum accumulated in carry
    args     : same, but dyn passed as a jit ARGUMENT
    xs       : uniforms sliced from stacked (N,...) scan xs
    ys       : checksum stacked as per-frame scan outputs (ys)
    of-carry : overflow flag chained through the scan carry
    full     : all of the above == render_sequence's program
    renderseq: the actual Renderer.render_sequence entry point

    nohup python tools/probe_seq.py > /tmp/probe_seq.log 2>&1 &
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
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=1_000_000)

    r.begin_frame()
    r.draw(pipe, mesh, uniforms(0.0))
    draws = r._draws
    r._draws, r._in_frame = [], False
    single = r._build_program(draws, 1.0, jit=False)
    dyn0 = r._dynamic_args(draws)
    clear_color = jnp.asarray((0.0, 0.0, 0.0, 0.0), jnp.float32)

    def uniforms_at(t):
        c, s = jnp.cos(t * 0.5), jnp.sin(t * 0.5)
        rot = jnp.asarray(
            [[c, 0.0, s, 0.0], [0.0, 1.0, 0.0, 0.0], [-s, 0.0, c, 0.0],
             [0.0, 0.0, 0.0, 1.0]], jnp.float32)
        u = dict(dyn0[0]["uniforms"])
        u["model"] = rot
        return u

    def uniform_stack(n, phase=0.0):
        ts = [uniforms(phase + i * 0.016) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ts)

    def make_prog(uniforms_from_xs, ys_out, of_carry, dyn_as_arg):
        def seq(dyn, useq, ticks, cc, c0):
            def body(carry, xs):
                us, tick = xs
                d = dict(dyn[0])
                if uniforms_from_xs:
                    d["uniforms"] = us
                else:
                    t = tick.astype(jnp.float32) * 0.016 + carry[0] * 1e-6
                    d["uniforms"] = uniforms_at(t)
                color, _dq, _tid, _st, of = single([d], cc)
                cs = jnp.sum(color)
                acc, ofl = carry
                if of_carry:
                    ofl = ofl | of
                if ys_out:
                    return (acc, ofl), cs
                return (acc + cs, ofl), ()

            xs = (useq, ticks)
            (acc, ofl), ys = jax.lax.scan(body, (c0, jnp.bool_(False)), xs)
            return (ys if ys_out else acc), ofl

        if dyn_as_arg:
            return jax.jit(seq)
        fixed = dyn0
        return jax.jit(lambda useq, ticks, cc, c0: seq(fixed, useq, ticks, cc, c0))

    def timed(name, fn, n1=2, n2=8, reps=3):
        def run(n):
            best = 1e9
            for k in range(reps + 1):  # first rep warms/compiles
                useq = uniform_stack(n, phase=1e-3 * k)
                ticks = jnp.arange(n, dtype=jnp.int32)
                t0 = time.perf_counter()
                out = fn(useq, ticks, jnp.float32(1.0 + 1e-3 * k))
                np.asarray(jax.tree.leaves(out)[0])
                dt = time.perf_counter() - t0
                if k:
                    best = min(best, dt)
            return best

        dt = (run(n2) - run(n1)) / (n2 - n1)
        print(f"{name:12s}: {dt * 1e3:8.2f} ms/frame", flush=True)

    variants = [
        ("direct", dict(uniforms_from_xs=False, ys_out=False, of_carry=False, dyn_as_arg=False)),
        ("args", dict(uniforms_from_xs=False, ys_out=False, of_carry=False, dyn_as_arg=True)),
        ("xs", dict(uniforms_from_xs=True, ys_out=False, of_carry=False, dyn_as_arg=False)),
        ("ys", dict(uniforms_from_xs=False, ys_out=True, of_carry=False, dyn_as_arg=False)),
        ("of-carry", dict(uniforms_from_xs=False, ys_out=False, of_carry=True, dyn_as_arg=False)),
        ("full", dict(uniforms_from_xs=True, ys_out=True, of_carry=True, dyn_as_arg=True)),
    ]
    for name, kw in variants:
        prog = make_prog(**kw)
        if kw["dyn_as_arg"]:
            fn = lambda useq, ticks, c0: prog(dyn0, useq, ticks, clear_color, c0)
        else:
            fn = lambda useq, ticks, c0: prog(useq, ticks, clear_color, c0)
        timed(name, fn)

    def rs(useq, ticks, c0):
        return r.render_sequence(pipe, mesh, useq)

    timed("renderseq", rs)


if __name__ == "__main__":
    main()
