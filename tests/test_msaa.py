"""Coverage-sample MSAA-4x: bit-identity and renderer-level behavior.

The Pallas kernel's per-sample visibility (ops/raster_pallas.py
_raster_kernel_msaa4) must be bit-identical to the oracle's
rasterize_msaa4 — per-sample winning tri_id AND per-sample quantized
depth at the Vulkan standard sample positions (fp.MSAA4_OFFSETS).  The
reference merely configures this stage (multisample state,
/root/reference/src/main.cpp:1790).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos
from based_renderer_tpu.ops import fixedpoint as fp
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
from based_renderer_tpu.ops.raster_xla import rasterize_vis as rasterize_xla_vis
from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.reference import oracle

W, H = 96, 64


def random_clip(seed, n=24):
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.5, 3.0, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-1.2, 1.2, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(0, 1, size=(n, 3, 1)).astype(np.float32) * w
    return np.concatenate([xy, z, w], -1).astype(np.float32)


def assert_msaa_identical(clip, depth_compare="less", tile=(32, 16)):
    ts = setup_triangles(jnp.asarray(clip), W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP)
    vp = rasterize_vis_pallas(
        ts,
        W,
        H,
        tile_w=tile[0],
        tile_h=tile[1],
        depth_compare=depth_compare,
        interpret=True,
        msaa4=True,
    )
    ora = oracle.rasterize_msaa4(clip, W, H, depth_compare=depth_compare)
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.depth_q), ora["depth_q"])
    # XLA backend: the same per-sample spec, third implementation.
    vx = rasterize_xla_vis(ts, W, H, depth_compare=depth_compare, msaa4=True)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vx.depth_q), ora["depth_q"])
    return ora


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_msaa_bitexact_random(seed):
    assert_msaa_identical(random_clip(seed))


def test_msaa_bitexact_greater_compare():
    assert_msaa_identical(random_clip(3), depth_compare="greater")


def test_msaa_per_sample_coverage_differs():
    """Sample layers genuinely differ at edges (otherwise MSAA is a no-op)."""
    ora = assert_msaa_identical(random_clip(4))
    tid = ora["tri_id"]
    assert (tid[0] != tid[1]).any() or (tid[0] != tid[2]).any()


def test_msaa_bitexact_slivers():
    """Subpixel slivers: sample positions, not pixel centers, decide
    coverage — the regime where per-sample bbox widening matters."""
    rng = np.random.default_rng(5)
    n = 48
    bx = rng.uniform(2.0, W - 3.0, size=n).astype(np.float32)
    by = rng.uniform(2.0, H - 3.0, size=n).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    ln = rng.uniform(0.1, 1.5, size=n).astype(np.float32)
    off = rng.uniform(1.0 / 16, 4.0 / 16, size=n).astype(np.float32)
    sx = np.stack([bx, bx + np.cos(ang) * ln, bx - np.sin(ang) * off], -1)
    sy = np.stack([by, by + np.sin(ang) * ln, by + np.cos(ang) * off], -1)
    z = rng.uniform(0, 1, size=(n, 1)).astype(np.float32) * np.ones((n, 3), np.float32)
    nx = sx / np.float32(W) * 2 - 1
    ny = sy / np.float32(H) * 2 - 1
    clip = np.stack([nx, ny, z, np.ones_like(nx)], axis=-1).astype(np.float32)
    assert_msaa_identical(clip)


@pytest.mark.parametrize("compare", ["less", "less_equal"])
@pytest.mark.parametrize("group", [8, 32])
def test_msaa_sublane_matches_sequential(compare, group):
    """The sublane MSAA kernel (_raster_kernel_msaa4_sublane) is
    bit-identical to the sequential MSAA kernel — per-sample tri_id,
    depth, barycentrics, invw, and interpolated channels — including
    equal-depth tie-breaking across group boundaries."""
    clip = np.concatenate(
        [random_clip(20, 40), np.repeat(random_clip(20, 40)[:5], 3, axis=0)]
    )
    rng = np.random.default_rng(21)
    ch = jnp.asarray(rng.normal(size=(len(clip), 3, 4)).astype(np.float32))
    ts = setup_triangles(jnp.asarray(clip), W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP)
    kw = dict(
        tile_w=128,
        tile_h=8,
        depth_compare=compare,
        channels=ch,
        msaa4=True,
        interpret=True,
    )
    vs, is_, ws_ = rasterize_vis_pallas(ts, W, H, **kw)
    vb, ib_, wb_ = rasterize_vis_pallas(
        ts, W, H, sublane=True, sublane_group=group, **kw
    )
    for name in ("tri_id", "depth_q", "b0", "b1", "b2"):
        np.testing.assert_array_equal(
            np.asarray(getattr(vs, name)), np.asarray(getattr(vb, name))
        )
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ib_))
    np.testing.assert_array_equal(np.asarray(ws_), np.asarray(wb_))


def test_msaa_sublane_no_depth_clip():
    """depth_clip=False takes the sublane MSAA kernel's late-bias path
    (the +2^29 plane bias hoisted out of the hot loop): per-sample
    coverage and depth must stay bit-identical to the sequential MSAA
    kernel."""
    clip = random_clip(22, 30)
    ts = setup_triangles(jnp.asarray(clip), W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP)
    kw = dict(tile_w=128, tile_h=8, msaa4=True, interpret=True, depth_clip=False)
    vs = rasterize_vis_pallas(ts, W, H, **kw)
    vb = rasterize_vis_pallas(ts, W, H, sublane=True, **kw)
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(vs.depth_q), np.asarray(vb.depth_q))


def test_msaa_sublane_init_chain():
    """init= chaining through the sublane MSAA kernel matches one oracle
    pass over both draws."""
    clip_a = random_clip(6, 10)
    clip_b = random_clip(7, 14)
    pad = fp.MSAA4_BBOX_PAD_FP
    ts_a = setup_triangles(jnp.asarray(clip_a), W, H, bbox_pad_fp=pad)
    ts_b = setup_triangles(jnp.asarray(clip_b), W, H, bbox_pad_fp=pad)
    kw = dict(tile_w=128, tile_h=8, interpret=True, msaa4=True, sublane=True)
    vp = rasterize_vis_pallas(ts_a, W, H, **kw)
    vp = rasterize_vis_pallas(ts_b, W, H, init=vp, id_offset=10, **kw)
    ora = oracle.rasterize_msaa4(np.concatenate([clip_a, clip_b]), W, H)
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.depth_q), ora["depth_q"])


def test_msaa_multidraw_init_chain():
    """init= chaining across draws matches one oracle pass over both sets."""
    clip_a = random_clip(6, 10)
    clip_b = random_clip(7, 14)
    pad = fp.MSAA4_BBOX_PAD_FP
    ts_a = setup_triangles(jnp.asarray(clip_a), W, H, bbox_pad_fp=pad)
    ts_b = setup_triangles(jnp.asarray(clip_b), W, H, bbox_pad_fp=pad)
    vp = rasterize_vis_pallas(ts_a, W, H, interpret=True, msaa4=True)
    vp = rasterize_vis_pallas(
        ts_b, W, H, interpret=True, msaa4=True, init=vp, id_offset=10
    )
    ora = oracle.rasterize_msaa4(np.concatenate([clip_a, clip_b]), W, H)
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.depth_q), ora["depth_q"])


def test_renderer_msaa_coverage_antialiases():
    """Renderer end-to-end: coverage MSAA ~matches supersampling and
    produces intermediate (antialiased) edge pixels."""
    pipe, mesh, uniforms = None, None, None
    cfg4 = brt.RendererConfig(width=128, height=96, msaa=4, raster_backend="pallas")
    r4 = brt.Renderer(cfg4)
    pipe, mesh, uniforms, _ = demos.cube_demo(r4)
    f4 = r4.render_frame(pipe, mesh, uniforms(0.6))
    c4 = f4.color_np()
    assert np.asarray(f4.tri_id).shape == (4, 96, 128)

    cfg_ss = brt.RendererConfig(
        width=128, height=96, msaa=4, msaa_supersample=True, raster_backend="xla"
    )
    fss = brt.Renderer(cfg_ss).render_frame(pipe, mesh, uniforms(0.6))
    css = fss.color_np()
    # Different sample positions => slightly different edges, same image.
    assert np.abs(c4 - css).mean() < 5e-3

    cfg1 = brt.RendererConfig(width=128, height=96, msaa=1, raster_backend="pallas")
    f1 = brt.Renderer(cfg1).render_frame(pipe, mesh, uniforms(0.6))
    c1 = f1.color_np()
    interior_max = c1[..., 0].max()
    n_interm = np.sum((c4[..., 0] > 0.02) & (c4[..., 0] < interior_max - 0.02))
    assert n_interm > 50  # antialiased edge gradient exists


def test_renderer_msaa_cross_backend_identical():
    """msaa=4 now means the same image on every backend: the XLA
    coverage-MSAA render matches Pallas bit-exactly in per-sample
    visibility and depth (color to f32 tolerance: shading orders ops
    differently but inputs are identical)."""
    pipe = mesh = uniforms = None
    frames = {}
    for backend in ("pallas", "xla"):
        cfg = brt.RendererConfig(
            width=128, height=96, msaa=4, raster_backend=backend
        )
        r = brt.Renderer(cfg)
        pipe, mesh, uniforms, _ = demos.cube_demo(r)
        frames[backend] = r.render_frame(pipe, mesh, uniforms(0.6))
    np.testing.assert_array_equal(
        np.asarray(frames["pallas"].tri_id), np.asarray(frames["xla"].tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(frames["pallas"].depth_q), np.asarray(frames["xla"].depth_q)
    )
    np.testing.assert_allclose(
        np.asarray(frames["pallas"].color_planar),
        np.asarray(frames["xla"].color_planar),
        atol=1e-5,
    )


def test_renderer_msaa_xla_textured():
    """XLA coverage MSAA with varyings: per-sample interpolation path."""
    cfg = brt.RendererConfig(width=128, height=96, msaa=4, raster_backend="xla")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.textured_cube_demo(r)
    f = r.render_frame(pipe, mesh, uniforms(0.5))
    c = f.color_np()
    assert np.isfinite(c).all() and (np.asarray(f.tri_id) >= 0).any()
