"""Covered-tile-compacted shading (ops/compact.py + Pipeline.shade_compact).

The compacted pass must be pixel-identical to full-screen shading for
pointwise fragment shaders (the vmapped-per-tile math is the same ops on
the same values), on both cond branches (within budget -> compacted;
over budget -> full-screen fallback)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos, geometry
from based_renderer_tpu.ops import compact as cp
from based_renderer_tpu.pipeline import BlendState, DepthState, Pipeline

W, H = 256, 48  # 2x6 = 12 tiles of (8, 128); small enough for 1-core CPU


def cfg(**kw):
    return brt.RendererConfig(width=W, height=H, raster_backend="pallas", **kw)


def test_tile_layout_roundtrip():
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(5, H, W)).astype(np.float32))
    rows = cp.tile_rows(planes, H, W)
    assert rows.shape == (cp.num_tiles(H, W), cp.TILE_H * cp.TILE_W * 5)
    back = cp.untile_rows(rows, 5, H, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(planes))
    # A gathered row really is that tile, channel-major (planar).
    t = cp.gather_tiles(rows, jnp.asarray([7], jnp.int32), 5)[0]
    nty, ntx = H // cp.TILE_H, W // cp.TILE_W
    ty, tx = 7 // ntx, 7 % ntx
    ref = np.asarray(planes)[
        :,
        ty * cp.TILE_H : (ty + 1) * cp.TILE_H,
        tx * cp.TILE_W : (tx + 1) * cp.TILE_W,
    ]
    np.testing.assert_array_equal(np.asarray(t), ref)


def test_covered_tile_order():
    mask = np.zeros((H, W), bool)
    mask[0, 0] = True  # tile 0
    mask[10, 200] = True  # tile row 1, col 1 -> tile 3
    order, count = cp.covered_tile_order(jnp.asarray(mask), H, W)
    assert int(count) == 2
    assert list(np.asarray(order[:2])) == [0, 3]
    # Remaining slots are the uncovered tiles, still unique and in order.
    assert sorted(np.asarray(order)) == list(range(cp.num_tiles(H, W)))


@pytest.mark.parametrize("budget_frac", [0.9, 0.05])
def test_compact_matches_full(budget_frac):
    """budget 0.9 -> compacted branch runs; 0.05 (1 tile, rounded to 8,
    cube covers more) may run either branch — both must match the
    uncompacted render exactly."""
    r = brt.Renderer(cfg())
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.4)
    base = r.render_frame(pipe, mesh, u)
    rc = brt.Renderer(cfg())
    cpipe = dataclasses.replace(pipe, shade_compact=budget_frac)
    got = rc.render_frame(cpipe, mesh, u)
    np.testing.assert_array_equal(
        np.asarray(got.color_planar), np.asarray(base.color_planar)
    )
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(base.tri_id))


@pytest.mark.parametrize("budget_frac", [(0.25, 0.6, 1.0), 0.02])
def test_compact_msaa_matches_full(budget_frac):
    """Coverage-MSAA compaction: sample layers fold into the tile-row
    channel axis.  tri_id/depth are untouched (raster-stage outputs);
    color matches the full pass to a few ulp (XLA contracts the fragment
    multiply-adds differently in the two compiled branches — see
    Pipeline.shade_compact)."""
    c = brt.RendererConfig(width=W, height=H, msaa=4, raster_backend="pallas")
    r = brt.Renderer(c)
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=300)
    u = uniforms(0.3)
    base = r.render_frame(pipe, mesh, u)
    cpipe = dataclasses.replace(pipe, shade_compact=budget_frac)
    got = brt.Renderer(c).render_frame(cpipe, mesh, u)
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(base.tri_id))
    np.testing.assert_array_equal(
        np.asarray(got.depth_q), np.asarray(base.depth_q)
    )
    a, b = np.asarray(base.color_planar), np.asarray(got.color_planar)
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)
    assert (b != a).mean() < 0.2  # overwhelmingly identical bits


def test_compact_multidraw_blend():
    """Compaction composes with multi-draw alpha blending: each draw
    blends over the accumulated buffer through its own compacted pass."""
    r = brt.Renderer(cfg())
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    tri = r.upload_mesh(geometry.triangle_mesh_data()["positions"])
    blend_pipe = Pipeline(
        shader="flat_ndc",
        depth=DepthState(test=False, write=False),
        blend=BlendState(
            enable=True, src_factor="src_alpha", dst_factor="one_minus_src_alpha"
        ),
    )
    u = uniforms(0.7)
    tu = {"color": (0.9, 0.3, 0.1, 0.4)}

    def render(compact):
        rr = brt.Renderer(cfg())
        p1, p2 = pipe, blend_pipe
        if compact:
            p1 = dataclasses.replace(p1, shade_compact=0.99)
            p2 = dataclasses.replace(p2, shade_compact=0.99)
        rr.begin_frame()
        rr.draw(p1, mesh, u)
        rr.draw(p2, tri, tu)
        return rr.end_frame()

    a, b = render(False), render(True)
    np.testing.assert_array_equal(np.asarray(b.color_planar), np.asarray(a.color_planar))


def test_compact_ignored_when_ineligible():
    """Framebuffers that don't tile by (8, 128) silently shade full-screen."""
    c = brt.RendererConfig(width=96, height=40, raster_backend="pallas")
    r = brt.Renderer(c)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    cpipe = dataclasses.replace(pipe, shade_compact=0.5)
    a = r.render_frame(pipe, mesh, uniforms(0.3))
    b = brt.Renderer(c).render_frame(cpipe, mesh, uniforms(0.3))
    np.testing.assert_array_equal(np.asarray(b.color_planar), np.asarray(a.color_planar))


def test_bad_budget_rejected():
    with pytest.raises(ValueError, match="shade_compact"):
        Pipeline(shade_compact=1.5)
    with pytest.raises(ValueError, match="shade_compact"):
        Pipeline(shade_compact=0.0)


def test_compact_budget_ladder():
    """A ladder of budgets renders identically to full-screen (each tier
    and the fallback), and a single float stays supported."""
    r = brt.Renderer(cfg())
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.5)
    base = r.render_frame(pipe, mesh, u)
    lpipe = dataclasses.replace(pipe, shade_compact=(0.1, 0.4, 0.9))
    got = brt.Renderer(cfg()).render_frame(lpipe, mesh, u)
    np.testing.assert_array_equal(
        np.asarray(got.color_planar), np.asarray(base.color_planar)
    )


def test_bad_ladder_rejected():
    with pytest.raises(ValueError, match="shade_compact"):
        Pipeline(shade_compact=(0.5, 1.5))
    with pytest.raises(ValueError, match="shade_compact"):
        Pipeline(shade_compact=())
