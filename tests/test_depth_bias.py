"""Depth bias / depth clamp: bit-identity and behavior.

The reference declares depthBiasEnable/depthClampEnable disabled in its
rasterization state (/root/reference/src/main.cpp:1777-1789); here both
are working features of the integer quantized-depth spec.  Bias is a
per-triangle integer offset on the quantized vertex depths (ops/setup.py),
so it must stay bit-identical across oracle, XLA, and Pallas paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import geometry
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
from based_renderer_tpu.ops.raster_xla import rasterize_vis
from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.pipeline import DepthState, Pipeline
from based_renderer_tpu.reference import oracle


def random_clip_triangles(rng, n, spread=1.2, z_range=(0.0, 1.0), w_range=(0.5, 3.0)):
    w = rng.uniform(*w_range, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-spread, spread, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(*z_range, size=(n, 3, 1)).astype(np.float32) * w
    return np.concatenate([xy, z, w], axis=-1).astype(np.float32)


@pytest.mark.parametrize("seed,bias", [
    (0, (1000.0, 0.0, 0.0)),
    (1, (0.0, 2.5, 0.0)),
    (2, (-500.0, 1.25, 0.001)),
    (3, (4096.0, -0.75, -0.0005)),
])
def test_biased_draw_bit_identical(seed, bias):
    rng = np.random.default_rng(seed)
    clip = random_clip_triangles(rng, 24)
    W, H = 96, 64
    ts = jax.jit(
        lambda c: setup_triangles(c, W, H, depth_bias=bias)
    )(jnp.asarray(clip))
    vx = jax.jit(lambda t: rasterize_vis(t, W, H))(ts)
    vp = jax.jit(lambda t: rasterize_vis_pallas(t, W, H, interpret=True))(ts)
    ora = oracle.rasterize(clip, W, H, depth_bias=bias)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vx.depth_q), ora["depth_q"])
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.depth_q), ora["depth_q"])


def test_bias_changes_depth_by_constant():
    """A pure constant bias shifts every covered depth by exactly
    rint(constant) quantized LSBs (2^6 final units each) while leaving
    coverage untouched (same winner, no gradient change)."""
    rng = np.random.default_rng(7)
    clip = random_clip_triangles(rng, 8, z_range=(0.3, 0.7))
    W, H = 64, 64
    ts0 = setup_triangles(jnp.asarray(clip), W, H)
    ts1 = setup_triangles(jnp.asarray(clip), W, H, depth_bias=(17.0, 0.0, 0.0))
    v0 = rasterize_vis(ts0, W, H, depth_test=False)
    v1 = rasterize_vis(ts1, W, H, depth_test=False)
    np.testing.assert_array_equal(np.asarray(v0.tri_id), np.asarray(v1.tri_id))
    covered = np.asarray(v0.tri_id) >= 0
    d0 = np.asarray(v0.depth_q)[covered].astype(np.int64)
    d1 = np.asarray(v1.depth_q)[covered].astype(np.int64)
    np.testing.assert_array_equal(d1 - d0, 17 * 64)


def test_bias_resolves_coplanar_fighting():
    """Classic decal case: the same triangle drawn twice z-fights (second
    draw loses under 'less'); a negative bias pulls the decal in front."""
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    tri = geometry.triangle_mesh_data()
    # Mid-range depth: the per-fragment depth clip runs after the bias
    # here (unlike Vulkan's clip-space z clipping), so a decal biased off
    # the z=0 near plane would be discarded.
    pos = np.concatenate(
        [tri["positions"][:, :2], np.full((3, 1), 0.5, np.float32)], axis=1
    )
    mesh = r.upload_mesh(pos)
    base = Pipeline(shader="flat_ndc")
    decal_unbiased = base
    decal_biased = Pipeline(
        shader="flat_ndc",
        depth=DepthState(bias_enable=True, bias_constant=-64.0),
    )
    r.begin_frame()
    r.draw(base, mesh, {"color": (1.0, 0.0, 0.0, 1.0)})
    r.draw(decal_unbiased, mesh, {"color": (0.0, 1.0, 0.0, 1.0)})
    f = r.end_frame()
    covered = np.asarray(f.tri_id) >= 0
    assert covered.any()
    # Unbiased second draw z-fights and loses everywhere (strict less).
    np.testing.assert_allclose(f.color_np()[covered][:, 0], 1.0, atol=1e-6)

    r.begin_frame()
    r.draw(base, mesh, {"color": (1.0, 0.0, 0.0, 1.0)})
    r.draw(decal_biased, mesh, {"color": (0.0, 1.0, 0.0, 1.0)})
    f2 = r.end_frame()
    np.testing.assert_allclose(f2.color_np()[covered][:, 1], 1.0, atol=1e-6)


def test_slope_bias_scales_with_gradient():
    """bias_slope contributes rint(slope * m) LSBs, m the triangle's max
    per-pixel depth slope — exactly zero for a screen-parallel triangle
    (w = 1, constant z: the depth gradients are exact integer zeros)."""
    rng = np.random.default_rng(3)
    flat = random_clip_triangles(rng, 4, z_range=(0.5, 0.5), w_range=(1.0, 1.0))
    W, H = 64, 64
    ts0 = setup_triangles(jnp.asarray(flat), W, H)
    ts1 = setup_triangles(jnp.asarray(flat), W, H, depth_bias=(0.0, 100.0, 0.0))
    v0 = rasterize_vis(ts0, W, H, depth_test=False)
    v1 = rasterize_vis(ts1, W, H, depth_test=False)
    np.testing.assert_array_equal(np.asarray(v0.depth_q), np.asarray(v1.depth_q))
    # A sloped triangle with the same slope factor does move.
    slope = random_clip_triangles(rng, 4, z_range=(0.1, 0.9), w_range=(1.0, 1.0))
    t0 = setup_triangles(jnp.asarray(slope), W, H)
    t1 = setup_triangles(jnp.asarray(slope), W, H, depth_bias=(0.0, 100.0, 0.0))
    w0 = rasterize_vis(t0, W, H, depth_test=False)
    w1 = rasterize_vis(t1, W, H, depth_test=False)
    cov = np.asarray(w0.tri_id) >= 0
    assert (np.asarray(w0.depth_q)[cov] != np.asarray(w1.depth_q)[cov]).any()


def test_depth_clamp_keeps_out_of_range_fragments():
    """depth clamp draws fragments past the far plane at z = 1 instead of
    discarding them (clip) — on oracle, XLA, and Pallas alike."""
    clip = np.array(
        [[[-0.9, -0.9, 1.3, 1.0], [0.9, -0.9, 1.3, 1.0], [0.0, 0.9, 1.3, 1.0]]],
        dtype=np.float32,
    )
    W, H = 48, 48
    ts = setup_triangles(jnp.asarray(clip), W, H)
    v_clip = rasterize_vis(ts, W, H, depth_clip=True)
    assert not (np.asarray(v_clip.tri_id) >= 0).any()
    # Clamped z lands exactly at the far plane (1.0), which correctly
    # still fails a strict "less" test against the cleared buffer — so
    # probe coverage with the test off, as Vulkan's depthClamp+noTest.
    for vis in (
        rasterize_vis(ts, W, H, depth_clip="clamp", depth_test=False),
        jax.jit(
            lambda t: rasterize_vis_pallas(
                t, W, H, depth_clip="clamp", depth_test=False, interpret=True
            )
        )(ts),
    ):
        covered = np.asarray(vis.tri_id) >= 0
        assert covered.any()
        np.testing.assert_array_equal(
            np.asarray(vis.depth_q)[covered], oracle.DEPTH_ONE_Q
        )
    ora = oracle.rasterize(clip, W, H, depth_clip="clamp", depth_test=False)
    v = rasterize_vis(ts, W, H, depth_clip="clamp", depth_test=False)
    np.testing.assert_array_equal(np.asarray(v.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(v.depth_q), ora["depth_q"])


def test_pipeline_clamp_through_renderer():
    r = brt.Renderer(brt.RendererConfig(width=48, height=48))
    pos = np.float32([[-0.9, -0.9, 1.4], [0.9, -0.9, 1.4], [0.0, 0.9, 1.4]])
    mesh = r.upload_mesh(pos)
    clipped = r.render_frame(Pipeline(shader="flat_ndc"), mesh, {"color": (1, 0, 0, 1)})
    assert not (np.asarray(clipped.tri_id) >= 0).any()
    clamped = r.render_frame(
        Pipeline(
            shader="flat_ndc", depth=DepthState(clamp=True, compare="less_equal")
        ),
        mesh,
        {"color": (1, 0, 0, 1)},
    )
    assert (np.asarray(clamped.tri_id) >= 0).any()
