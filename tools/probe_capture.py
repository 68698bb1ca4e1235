#!/usr/bin/env python
"""Sequence-constant passing strategies for big-mesh scan programs, on TPU.

The round-2/3 measurement (tools/probe_seq.py, recorded in CLAUDE.md and
renderer.render_sequence_multi) found mesh-as-jit-parameter costs
+24 ms/frame over closure capture — XLA keeps a loop-invariant
relayout/copy inside the lax.scan for parameters that it folds away for
constants.  The capture fix works but bakes ~70 MB of mesh into every
sequence executable (~505 MB raw, ~90 MB compressed cache entries),
making every compile/serialize/load of a big-mesh program minutes-slow
through the remote tunnel.  This probe re-litigates that trade with
layout control:

    python tools/probe_capture.py cap      # closure capture (current)
    python tools/probe_capture.py arg      # naive jit parameter
    python tools/probe_capture.py argbar   # parameter + pre-scan
                                           # optimization_barrier copy
    python tools/probe_capture.py argauto  # parameter with AUTO input
                                           # layouts (jax.experimental.
                                           # layout): XLA picks the
                                           # body-preferred layout, caller
                                           # device_puts to match

One arm per process (within-process drift, CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "cap"
    n1, n2 = 2, 8

    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    tris = int(os.environ.get("BRT_PROBE_TRIS", 1_000_000))
    size = os.environ.get("BRT_PROBE_SIZE", "1920x1080")
    W, H = (int(v) for v in size.split("x"))
    r = brt.Renderer(brt.RendererConfig(width=W, height=H))
    pipe, mesh, uniforms, _ = demos.DEMOS["big_mesh"](r, triangles=tris)

    r.begin_frame()
    r.draw(pipe, mesh, uniforms(0.0))
    draws = r._draws
    r._draws, r._in_frame = [], False
    single = r._build_program(draws, r._frame_clear[1], jit=False)
    base_dyn = r._dynamic_args(draws)
    for d in base_dyn:
        d.pop("uniforms")
    clear_color = jnp.asarray(r._frame_clear[0], jnp.float32)

    if arm == "prod":
        # The PRODUCTION path (renderer.render_sequence with the
        # generator-aware carry threading) under this probe's exact
        # harness — the apples-to-apples check against gencarry.
        def run_prod(n, phase):
            useq = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[uniforms(phase + 0.016 * i) for i in range(n)],
            )
            return np.asarray(r.render_sequence(pipe, mesh, useq))

        best = {}
        for n in (n1, n2):
            run_prod(n, 0.9)  # compile
            b = 1e9
            for k in range(2):
                t0 = time.perf_counter()
                s = run_prod(n, 1e-3 * (k + 1))
                b = min(b, time.perf_counter() - t0)
            assert len(set(np.round(s, 1))) > min(5, n // 4)
            best[n] = b
        dt = (best[n2] - best[n1]) / (n2 - n1)
        print(f"big_mesh {size} prod: {dt * 1e3:8.3f} ms/frame", flush=True)
        return

    capture = arm == "cap"
    carry_mode = arm in ("carry", "gencarry")

    def seq(dyn, useq, ticks, clear):
        if arm == "gencarry":
            # In-program generation, then thread the big arrays through
            # the scan CARRY: while-loop carries get ONE layout chosen
            # for the whole loop (init + body), so the per-step
            # conversion a loop-invariant free operand pays should
            # disappear.
            from based_renderer_tpu.models import geometry as geo

            g = geo.procedural_mesh_device(tris)()
            dyn = tuple(
                {**d, "attrs": g} for d in [dict(d0) for d0 in base_dyn]
            )
        src0 = base_dyn if capture else dyn
        if arm == "argbar":
            src0 = jax.lax.optimization_barrier(src0)

        def body(carry, xs):
            u, tick = xs
            if carry_mode:
                flag, src = carry
            else:
                flag, src = carry, src0
            ds = []
            for d0 in src:
                d = dict(d0)
                d["uniforms"] = u
                ds.append(d)
            color, _dq, _ti, _st, of = single(ds, clear)
            out_carry = (flag | of, src) if carry_mode else flag | of
            return out_carry, jnp.sum(color)

        init = (jnp.bool_(False), src0) if carry_mode else jnp.bool_(False)
        fin, sums = jax.lax.scan(body, init, (useq, ticks))
        of = fin[0] if carry_mode else fin
        return sums, of

    def make_useq(n, phase):
        return jax.block_until_ready(
            jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[uniforms(phase + 0.016 * i) for i in range(n)],
            )
        )

    dyn_arg = () if capture else tuple(base_dyn)

    runners = {}

    def build(n):
        ticks = jnp.arange(n, dtype=jnp.int32)
        proto = make_useq(n, 0.9)
        if arm == "argauto":
            from jax.experimental.layout import Format, Layout

            jf = jax.jit(seq, in_shardings=Format(Layout.AUTO))
            t0 = time.time()
            # AUTO layouts require ABSTRACT avals at lowering time (a
            # concrete array already has a layout, which conflicts).
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
                (dyn_arg, proto, ticks, clear_color),
            )
            compiled = jf.lower(*abstract).compile()
            print(f"n={n} compile: {time.time() - t0:.1f}s", flush=True)
            fmts = compiled.input_formats[0]
            dyn_dev = jax.tree.map(jax.device_put, dyn_arg, fmts[0])
            ticks_dev = jax.tree.map(jax.device_put, ticks, fmts[2])
            clear_dev = jax.tree.map(jax.device_put, clear_color, fmts[3])

            def run_once(useq):
                ud = jax.tree.map(jax.device_put, useq, fmts[1])
                return compiled(dyn_dev, ud, ticks_dev, clear_dev)

        else:
            jf = jax.jit(seq)

            def run_once(useq):
                return jf(dyn_arg, useq, ticks, clear_color)

        # warm (compile on first dispatch for the non-AOT arms)
        t0 = time.time()
        s, of = run_once(proto)
        np.asarray(s)
        print(f"n={n} first dispatch: {time.time() - t0:.1f}s", flush=True)
        assert not bool(np.asarray(of))
        runners[n] = run_once

    def timed(n):
        best = 1e9
        for k in range(2):
            useq = make_useq(n, 1e-3 * (k + 1))
            t0 = time.perf_counter()
            s, _ = runners[n](useq)
            s = np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        assert len(set(np.round(s, 1))) > min(5, n // 4)
        return best

    build(n1)
    build(n2)
    a, b = timed(n1), timed(n2)
    dt = (b - a) / (n2 - n1)
    print(f"big_mesh {size} {arm}: {dt * 1e3:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
