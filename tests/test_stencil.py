"""Stencil test/write state: bit-identity and renderer-level masking.

The reference allocates a D24_UNORM_S8_UINT depth-stencil image
(/root/reference/src/main.cpp:1472-1484) whose S8 half it never uses;
this suite pins the working TPU implementation (pipeline.StencilState)
bitwise across oracle <-> XLA <-> Pallas(interpret), including the MSAA
per-sample stencil.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.pipeline import DepthState, Pipeline, StencilState
from based_renderer_tpu.ops import fixedpoint as fp
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
from based_renderer_tpu.ops.raster_xla import rasterize_vis
from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.reference import oracle

W, H = 96, 64


def random_clip(seed, n=24):
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.5, 3.0, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-1.2, 1.2, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(0, 1, size=(n, 3, 1)).astype(np.float32) * w
    return np.concatenate([xy, z, w], -1).astype(np.float32)


def assert_stencil_identical(clip, st, two_pass=False, stencil_clear=0):
    ts = setup_triangles(jnp.asarray(clip), W, H)
    vx = rasterize_vis(ts, W, H, stencil=st, stencil_clear=stencil_clear)
    vp = rasterize_vis_pallas(
        ts,
        W,
        H,
        interpret=True,
        stencil=st,
        stencil_clear=stencil_clear,
        two_pass=two_pass,
    )
    ora = oracle.rasterize(clip, W, H, stencil=st, stencil_clear=stencil_clear)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vx.depth_q), ora["depth_q"])
    np.testing.assert_array_equal(np.asarray(vx.stencil), ora["stencil"])
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.depth_q), ora["depth_q"])
    np.testing.assert_array_equal(np.asarray(vp.stencil), ora["stencil"])
    return ora


@pytest.mark.parametrize("two_pass", [False, True])
def test_stencil_increment_overdraw(two_pass):
    """always/increment counts overdraw per pixel — classic stencil use."""
    st = StencilState(
        enable=True, compare="always", pass_op="increment_clamp",
        depth_fail_op="increment_wrap", fail_op="keep",
    )
    ora = assert_stencil_identical(random_clip(0), st, two_pass=two_pass)
    assert ora["stencil"].max() >= 2  # genuine overlap exercised


def test_stencil_ops_zoo():
    """replace/invert/decrement with masks, nonzero clear."""
    st = StencilState(
        enable=True,
        compare="greater_equal",
        ref=0x35,
        compare_mask=0xF0,
        write_mask=0x66,
        pass_op="replace",
        fail_op="invert",
        depth_fail_op="decrement_clamp",
    )
    assert_stencil_identical(random_clip(1), st, stencil_clear=0x40)


def test_stencil_never_fail_ops_still_apply():
    st = StencilState(enable=True, compare="never", fail_op="increment_clamp")
    ora = assert_stencil_identical(random_clip(2), st)
    assert (ora["tri_id"] == -1).all()  # nothing passes the stencil test
    assert ora["stencil"].max() >= 1  # but fail ops touched the buffer


def test_stencil_msaa_per_sample():
    st = StencilState(enable=True, compare="always", pass_op="increment_clamp")
    clip = random_clip(3)
    ts = setup_triangles(jnp.asarray(clip), W, H, bbox_pad_fp=fp.MSAA4_BBOX_PAD_FP)
    vp = rasterize_vis_pallas(ts, W, H, interpret=True, msaa4=True, stencil=st)
    ora = oracle.rasterize_msaa4(clip, W, H, stencil=st)
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.stencil), ora["stencil"])
    # Edge pixels: per-sample stencil counts differ between samples.
    s = ora["stencil"]
    assert (s[0] != s[1]).any() or (s[0] != s[2]).any()


def test_renderer_stencil_masked_draw():
    """Two-draw frame: draw A stamps the stencil, draw B renders only where
    the stencil equals the stamp — the canonical masking recipe."""
    import based_renderer_tpu.models.geometry as geometry

    cfg = brt.RendererConfig(width=96, height=64, raster_backend="pallas")
    r = brt.Renderer(cfg)
    tri = geometry.triangle_mesh_data()["positions"]  # NDC triangle
    mesh_a = r.upload_mesh(tri * np.float32(0.6))  # small stamp
    mesh_b = r.upload_mesh(tri)  # big triangle

    stamp = Pipeline(
        shader="flat_ndc",
        depth=DepthState(test=False, write=False),
        stencil=StencilState(enable=True, compare="always", ref=1, pass_op="replace"),
    )
    masked = Pipeline(
        shader="flat_ndc",
        depth=DepthState(test=False, write=False),
        stencil=StencilState(enable=True, compare="equal", ref=1),
    )
    r.begin_frame()
    r.draw(stamp, mesh_a, {"color": (1.0, 0.0, 0.0, 1.0)})
    r.draw(masked, mesh_b, {"color": (0.0, 1.0, 0.0, 1.0)})
    f = r.end_frame()
    c = f.color_np()
    stencil = np.asarray(f.stencil)
    # Draw B (green) appears exactly where draw A stamped stencil==1.
    green = c[..., 1] > 0.5
    np.testing.assert_array_equal(green, stencil == 1)
    assert green.any() and not green.all()
    # XLA backend agrees.
    cfg_x = brt.RendererConfig(width=96, height=64, raster_backend="xla")
    rx = brt.Renderer(cfg_x)
    rx.begin_frame()
    rx.draw(stamp, mesh_a, {"color": (1.0, 0.0, 0.0, 1.0)})
    rx.draw(masked, mesh_b, {"color": (0.0, 1.0, 0.0, 1.0)})
    fx = rx.end_frame()
    np.testing.assert_array_equal(np.asarray(fx.stencil), stencil)
    np.testing.assert_allclose(fx.color_np(), c, atol=1e-6)
