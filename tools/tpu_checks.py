#!/usr/bin/env python
"""Real-TPU verification suite (run on a machine with a TPU attached).

The CPU test suite (tests/) proves oracle <-> XLA <-> Pallas-interpret
bit-identity; this script re-proves it against the *compiled* Mosaic
kernel and the real XLA:TPU backend, where f32 division is not IEEE and
FMA contraction differs — exactly the hazards the spec was built against.

    python tools/tpu_checks.py            # correctness (full)
    python tools/tpu_checks.py --quick    # every kernel-variant arm, one seed,
                                          # skips the renderer-level e2e checks
                                          # (< 3 min with a warm compile cache)
    python tools/tpu_checks.py --perf     # + per-config throughput

Run it from the repo root; expect a few minutes of kernel compiles on
first run (enable the persistent cache to amortize).

Ritual (CLAUDE.md): any commit touching ops/raster_*, ops/binning.py, or
ops/binassem.py requires a green run (at least --quick) on the real TPU
before the round ends; commit the log (tools/tpu_checks_r*.log).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check_bit_identity(quick: bool = False):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from based_renderer_tpu.ops.setup import setup_triangles
    from based_renderer_tpu.ops.raster_xla import rasterize_vis
    from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
    from based_renderer_tpu.reference import oracle

    ok = True
    for seed in range(1 if quick else 4):
        rng = np.random.default_rng(seed)
        n = 24
        w = rng.uniform(0.5, 3.0, size=(n, 3, 1)).astype(np.float32)
        xy = rng.uniform(-1.2, 1.2, size=(n, 3, 2)).astype(np.float32) * w
        z = rng.uniform(0, 1, size=(n, 3, 1)).astype(np.float32) * w
        clip = np.concatenate([xy, z, w], -1).astype(np.float32)
        W, H = 256, 128
        ts = jax.jit(lambda c: setup_triangles(c, W, H))(jnp.asarray(clip))
        ora = oracle.rasterize(clip, W, H)
        for name, vis in (
            ("xla", rasterize_vis(ts, W, H)),
            ("pallas", rasterize_vis_pallas(ts, W, H)),
        ):
            t_ok = np.array_equal(np.asarray(vis.tri_id), ora["tri_id"])
            d_ok = np.array_equal(np.asarray(vis.depth_q), ora["depth_q"])
            print(f"seed {seed} {name:6s}: tri_id={t_ok} depth_q={d_ok}", flush=True)
            ok &= t_ok and d_ok
    # Coverage-sample MSAA-4x (per-sample visibility) under compiled Mosaic.
    from based_renderer_tpu.ops import fixedpoint as fp
    from based_renderer_tpu.pipeline import StencilState

    rng = np.random.default_rng(7)
    n = 24
    w = rng.uniform(0.5, 3.0, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-1.2, 1.2, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(0, 1, size=(n, 3, 1)).astype(np.float32) * w
    clip = np.concatenate([xy, z, w], -1).astype(np.float32)
    W, H = 256, 128
    ts = setup_triangles(jnp.asarray(clip), W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP)
    vm = rasterize_vis_pallas(ts, W, H, msaa4=True)
    om = oracle.rasterize_msaa4(clip, W, H)
    m_ok = np.array_equal(np.asarray(vm.tri_id), om["tri_id"]) and np.array_equal(
        np.asarray(vm.depth_q), om["depth_q"]
    )
    print(f"msaa4 mosaic: {m_ok}", flush=True)
    ok &= m_ok

    # Stencil ops under compiled Mosaic.
    st = StencilState(
        enable=True, compare="greater_equal", ref=0x35, compare_mask=0xF0,
        write_mask=0x66, pass_op="replace", fail_op="invert",
        depth_fail_op="decrement_clamp",
    )
    ts2 = setup_triangles(jnp.asarray(clip), W, H)
    vs = rasterize_vis_pallas(ts2, W, H, stencil=st, stencil_clear=0x40)
    os_ = oracle.rasterize(clip, W, H, stencil=st, stencil_clear=0x40)
    s_ok = np.array_equal(np.asarray(vs.tri_id), os_["tri_id"]) and np.array_equal(
        np.asarray(vs.stencil), os_["stencil"]
    )
    print(f"stencil mosaic: {s_ok}", flush=True)
    ok &= s_ok

    # Batched-reduction kernel under compiled Mosaic.
    vb = rasterize_vis_pallas(ts2, W, H, batch=8)
    ob = oracle.rasterize(clip, W, H)
    b_ok = np.array_equal(np.asarray(vb.tri_id), ob["tri_id"]) and np.array_equal(
        np.asarray(vb.depth_q), ob["depth_q"]
    )
    print(f"batched mosaic: {b_ok}", flush=True)
    ok &= b_ok

    # Sublane-parallel kernel under compiled Mosaic (incl. the one-hot
    # HIGHEST-precision attribute matmul and the f32 triangle-id column).
    vl = rasterize_vis_pallas(ts2, W, H, tile_h=8, sublane=True)
    s_seq = rasterize_vis_pallas(ts2, W, H, tile_h=8)
    l_ok = np.array_equal(np.asarray(vl.tri_id), ob["tri_id"]) and np.array_equal(
        np.asarray(vl.depth_q), ob["depth_q"]
    )
    for k in ("b0", "b1", "b2"):
        l_ok &= bool(
            np.allclose(
                np.asarray(getattr(vl, k)), np.asarray(getattr(s_seq, k)), atol=1e-6
            )
        )
    print(f"sublane mosaic: {l_ok}", flush=True)
    ok &= l_ok

    # Sub-tile band binning (Pipeline.raster_bin_rows) under compiled
    # Mosaic: column-major band bin ids + output-tile re-anchoring + the
    # kernel's per-band group loops must reproduce the unbanded result
    # bit-exactly (records are re-anchored, so even the f32 varying
    # planes must match bit-for-bit).  Band binning multiplies (band, tri)
    # pairs ~tile_h/bin_rows-fold, so size the budgets for the banded
    # stream (mirrors tests/test_bin_rows.py) and ASSERT the overflow flag
    # — a breached budget silently drops records and would "fail" the
    # comparison for a reason that has nothing to do with the kernel
    # (exactly the round-4 bug this arm shipped with).
    band_budget = dict(max_pairs=n * 256, slots=n * 256)
    for br in (2, 4):
        vb_r, of_r = rasterize_vis_pallas(
            ts2, W, H, tile_h=8, sublane=True, bin_rows=br,
            return_overflow=True, **band_budget,
        )
        br_ok = not bool(np.asarray(of_r))
        br_ok &= np.array_equal(
            np.asarray(vb_r.tri_id), ob["tri_id"]
        ) and np.array_equal(np.asarray(vb_r.depth_q), ob["depth_q"])
        for k in ("b0", "b1", "b2"):
            br_ok &= bool(
                np.array_equal(
                    np.asarray(getattr(vb_r, k)), np.asarray(getattr(vl, k))
                )
            )
        print(f"sublane bin_rows={br} mosaic: {br_ok}", flush=True)
        ok &= br_ok

    # Band binning with the PALLAS record assembly — the configuration the
    # probe arms actually time (bin_rows stacked on raster_assemble=
    # "pallas").  tri_id/depth_q stay bit-exact; the re-anchored f32 plane
    # BASES may differ from the XLA assembly by ~1 ulp of the largest
    # term (tests/test_binassem.py), so bases get a tight tolerance.
    vb_p, of_p = rasterize_vis_pallas(
        ts2, W, H, tile_h=8, sublane=True, bin_rows=2, assemble="pallas",
        return_overflow=True, **band_budget,
    )
    bp_ok = not bool(np.asarray(of_p))
    bp_ok &= np.array_equal(
        np.asarray(vb_p.tri_id), ob["tri_id"]
    ) and np.array_equal(np.asarray(vb_p.depth_q), ob["depth_q"])
    for k in ("b0", "b1", "b2"):
        bp_ok &= bool(
            np.allclose(
                np.asarray(getattr(vb_p, k)), np.asarray(getattr(vl, k)),
                rtol=1e-6, atol=2e-5,
            )
        )
    print(f"sublane bin_rows=2 pallas-assembly mosaic: {bp_ok}", flush=True)
    ok &= bp_ok

    # Pallas template layout (Pipeline.raster_tmpl="pallas") under
    # compiled Mosaic: the field-major build + tiled transpose is pure
    # data movement, so the binned RECORD STREAMS must be bitwise equal
    # to the stack(axis=-1) layout — records, frecords, and tile tables.
    from based_renderer_tpu.ops.binning import bin_triangles

    ch_t = jnp.asarray(
        np.random.default_rng(11).normal(size=(n, 3, 4)).astype(np.float32)
    )
    b_base = jax.jit(
        lambda t, c: bin_triangles(t, W, H, channels=c, tile_w=128, tile_h=8,
                                   max_pairs=n * 128)
    )(ts2, ch_t)
    b_tmpl = jax.jit(
        lambda t, c: bin_triangles(t, W, H, channels=c, tile_w=128, tile_h=8,
                                   max_pairs=n * 128, tmpl="pallas")
    )(ts2, ch_t)
    tp_ok = np.array_equal(np.asarray(b_base.records), np.asarray(b_tmpl.records))
    tp_ok &= np.array_equal(
        np.asarray(b_base.frecords).view(np.int32),
        np.asarray(b_tmpl.frecords).view(np.int32),
    )
    tp_ok &= np.array_equal(
        np.asarray(b_base.tile_start), np.asarray(b_tmpl.tile_start)
    ) and np.array_equal(np.asarray(b_base.tile_count), np.asarray(b_tmpl.tile_count))
    print(f"tmpl pallas-transpose mosaic: {tp_ok}", flush=True)
    ok &= tp_ok

    # Sublane coverage-MSAA kernel under compiled Mosaic (the widened
    # one-hot matmul + per-sample accumulators).
    vms = rasterize_vis_pallas(ts, W, H, tile_h=8, sublane=True, msaa4=True)
    ms_ok = np.array_equal(np.asarray(vms.tri_id), om["tri_id"]) and np.array_equal(
        np.asarray(vms.depth_q), om["depth_q"]
    )
    print(f"msaa4 sublane mosaic: {ms_ok}", flush=True)
    ok &= ms_ok

    # depth_clip=False (late_bias) in BOTH sublane kernels under compiled
    # Mosaic: the unbiased accumulation domain is a different int32 code
    # path than the default depth-clip fold (raster_pallas.py late_bias),
    # so prove it against the oracle with z spilling outside [0, 1].
    zc = rng.uniform(-0.25, 1.25, size=(n, 3, 1)).astype(np.float32) * w
    clip_c = np.concatenate([xy, zc, w], -1).astype(np.float32)
    ts_c = setup_triangles(jnp.asarray(clip_c), W, H)
    o_c = oracle.rasterize(clip_c, W, H, depth_clip=False)
    vl_c = rasterize_vis_pallas(ts_c, W, H, tile_h=8, sublane=True, depth_clip=False)
    c_ok = np.array_equal(np.asarray(vl_c.tri_id), o_c["tri_id"]) and np.array_equal(
        np.asarray(vl_c.depth_q), o_c["depth_q"]
    )
    print(f"sublane late_bias mosaic: {c_ok}", flush=True)
    ok &= c_ok
    ts_cm = setup_triangles(
        jnp.asarray(clip_c), W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP
    )
    o_cm = oracle.rasterize_msaa4(clip_c, W, H, depth_clip=False)
    vm_c = rasterize_vis_pallas(
        ts_cm, W, H, tile_h=8, sublane=True, msaa4=True, depth_clip=False
    )
    cm_ok = np.array_equal(np.asarray(vm_c.tri_id), o_cm["tri_id"]) and np.array_equal(
        np.asarray(vm_c.depth_q), o_cm["depth_q"]
    )
    print(f"msaa4 sublane late_bias mosaic: {cm_ok}", flush=True)
    ok &= cm_ok

    if quick:
        # --quick covers every KERNEL-variant arm above; the remaining
        # checks are renderer-level end-to-end compiles (instance_cull,
        # separable sampler) that dominate cold wall time.
        print("TPU BIT-IDENTITY (quick):", "PASS" if ok else "FAIL", flush=True)
        return ok

    # Per-instance culling end-to-end on the real backend: culled frame
    # must be bit-identical (tri_id/depth_q) to the unculled one.
    import dataclasses

    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    cfg = brt.RendererConfig(width=256, height=128, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, inst = demos.instanced_demo(r, count=512)
    # The demo's 0.85 budget is measured for its 10k layout; this 512-cube
    # slice is ~86% visible at t=0.7, so give the check its own headroom.
    pipe = dataclasses.replace(pipe, instance_cull=0.95)
    u = uniforms(0.7)
    base = r.render_frame(
        dataclasses.replace(pipe, instance_cull=None), mesh, u, instances=inst
    )
    culled = r.render_frame(pipe, mesh, u, instances=inst)
    cu_ok = (
        not bool(np.asarray(culled.overflowed))
        and np.array_equal(np.asarray(base.tri_id), np.asarray(culled.tri_id))
        and np.array_equal(np.asarray(base.depth_q), np.asarray(culled.depth_q))
    )
    print(f"instance_cull bit-identity: {cu_ok}", flush=True)
    ok &= cu_ok

    # Separable MXU resampler on the real backend: the one-hot
    # HIGHEST-precision fetch must reconstruct texels bit-exactly (at
    # texel centers the blend weights vanish, so the sample IS the
    # fetched texel), and the blended field must match the gather
    # sampler to FMA-contraction tolerance.
    from based_renderer_tpu.ops import texture as tex_ops
    from based_renderer_tpu.scene import upload_texture

    trng = np.random.default_rng(11)
    base_tex = trng.random((64, 128, 4)).astype(np.float32)
    tex = upload_texture(base_tex, mipmaps=True, mip_filter="linear")
    uc = jnp.asarray((np.arange(128) + 0.5) / 128.0, jnp.float32)
    vc = jnp.asarray((np.arange(64) + 0.5) / 64.0, jnp.float32)
    fetch = np.asarray(jax.jit(tex_ops.sample_separable)(tex, uc, vc, jnp.float32(-1.0)))
    f_ok = np.array_equal(fetch, base_tex)
    u_row = jnp.asarray(trng.uniform(-0.3, 1.6, (160,)).astype(np.float32))
    v_col = jnp.asarray(trng.uniform(-0.3, 1.6, (96,)).astype(np.float32))
    uv_b = jnp.stack(
        [
            jnp.broadcast_to(u_row[None, :], (96, 160)),
            jnp.broadcast_to(v_col[:, None], (96, 160)),
        ],
        axis=-1,
    )
    sep = np.asarray(
        jax.jit(tex_ops.sample_separable)(tex, u_row, v_col, jnp.float32(1.3))
    )
    gat = np.asarray(
        jax.jit(lambda u: tex_ops.sample_trilinear(tex, u, jnp.full(u.shape[:-1], 1.3)))(
            uv_b
        )
    )
    g_ok = bool(np.allclose(sep, gat, atol=3e-7))
    print(f"separable sampler: fetch_exact={f_ok} blend_ulp={g_ok}", flush=True)
    ok &= f_ok and g_ok

    print("TPU BIT-IDENTITY:", "PASS" if ok else "FAIL", flush=True)
    return ok


def perf():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu.scene import Texture

    def bench_seq(name, W, H, msaa=1, n1=4, n2=12, **dkw):
        cfg = brt.RendererConfig(width=W, height=H, msaa=msaa)
        r = brt.Renderer(cfg)
        pipe, mesh, uniforms, inst = demos.DEMOS[name](r, **dkw)
        u0 = uniforms(0.0)
        static = {k: v for k, v in u0.items() if isinstance(v, Texture)}

        def strip(u):
            return {k: v for k, v in u.items() if k not in static}

        def run(n):
            if strip(u0):
                useq = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[strip(uniforms(0.016 * i)) for i in range(n)]
                )
                useq = jax.block_until_ready(useq)
            else:
                useq = {}
            kw = dict(instances=inst, num_frames=n, static_uniforms=static)
            np.asarray(r.render_sequence(pipe, mesh, useq, **kw))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(r.render_sequence(pipe, mesh, useq, **kw))
                best = min(best, time.perf_counter() - t0)
            return best

        a, b = run(n1), run(n2)
        dt = (b - a) / (n2 - n1)
        print(
            f"{name:14s} {W}x{H} msaa={msaa}: {dt * 1e3:9.3f} ms/frame = {1 / dt:8.1f} fps",
            flush=True,
        )

    bench_seq("cube", 1920, 1080, n1=16, n2=48)
    bench_seq("textured_cube", 1920, 1080)
    bench_seq("instanced", 1920, 1080, n1=2, n2=6, count=10000)
    bench_seq("big_mesh", 1920, 1080, n1=2, n2=6, triangles=1_000_000)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from based_renderer_tpu.utils import cache

    cache.enable_persistent_cache()
    ok = check_bit_identity(quick=args.quick)
    if args.perf:
        perf()
    sys.exit(0 if ok else 1)
