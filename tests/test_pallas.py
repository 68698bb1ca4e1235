"""Pallas tile-binned rasterizer vs the XLA exact path (interpret mode).

Coverage and depth must be bit-identical; barycentrics agree to ~1e-4
(the Pallas path derives them from clamped tile-anchored edge values).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos
from based_renderer_tpu.ops.binning import bin_triangles
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
from based_renderer_tpu.ops.raster_xla import rasterize_vis
from based_renderer_tpu.ops.setup import setup_triangles


def random_clip(seed, n=24):
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.5, 3.0, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-1.2, 1.2, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(0, 1, size=(n, 3, 1)).astype(np.float32) * w
    return np.concatenate([xy, z, w], -1).astype(np.float32)


@pytest.mark.parametrize("tile", [(128, 32), (128, 8), (64, 64)])
def test_pallas_matches_xla(tile):
    clip = random_clip(0)
    W, H = 96, 64
    ts = setup_triangles(jnp.asarray(clip), W, H)
    vx = rasterize_vis(ts, W, H)
    vp = rasterize_vis_pallas(ts, W, H, tile_w=tile[0], tile_h=tile[1], interpret=True)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), np.asarray(vp.tri_id))
    np.testing.assert_array_equal(np.asarray(vx.depth_q), np.asarray(vp.depth_q))
    m = np.asarray(vx.tri_id) >= 0
    for k in ("b0", "b1", "b2"):
        np.testing.assert_allclose(
            np.asarray(getattr(vx, k))[m], np.asarray(getattr(vp, k))[m], atol=2e-4
        )


def test_pallas_multidraw_init_chain():
    """init= chaining across draws matches one big XLA pass."""
    clip_a = random_clip(1, 10)
    clip_b = random_clip(2, 14)
    W, H = 96, 64
    ts_a = setup_triangles(jnp.asarray(clip_a), W, H)
    ts_b = setup_triangles(jnp.asarray(clip_b), W, H)
    # XLA: two chained passes.
    vx = rasterize_vis(ts_a, W, H)
    vx = rasterize_vis(ts_b, W, H, init=vx, id_offset=10)
    # Pallas: clear + chained init.
    vp = rasterize_vis_pallas(ts_a, W, H, interpret=True)
    vp = rasterize_vis_pallas(ts_b, W, H, interpret=True, init=vp, id_offset=10)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), np.asarray(vp.tri_id))
    np.testing.assert_array_equal(np.asarray(vx.depth_q), np.asarray(vp.depth_q))


def test_binning_covers_bboxes():
    """Every valid triangle appears in exactly the tiles its bbox covers."""
    clip = random_clip(3, 12)
    W, H = 96, 64
    tw, th = 32, 16
    ts = setup_triangles(jnp.asarray(clip), W, H)
    binned = bin_triangles(ts, W, H, tile_w=tw, tile_h=th)
    num_tx = -(-W // tw)
    starts = np.asarray(binned.tile_start)
    counts = np.asarray(binned.tile_count)
    recs = np.asarray(binned.records)  # (RECORD_WIDTH, PADDED_PAIRS)
    bbox = np.asarray(ts.bbox)
    valid = np.asarray(ts.valid)
    assert not bool(binned.overflowed)
    # Reconstruct tile->tris map.
    seen = {}
    for tile in range(len(starts)):
        ids = recs[13, starts[tile] : starts[tile] + counts[tile]]
        seen[tile] = list(ids)
        # Draw order preserved within a tile.
        assert list(ids) == sorted(ids)
    for t in range(clip.shape[0]):
        if not valid[t]:
            for tile, ids in seen.items():
                assert t not in ids
            continue
        x0, y0, x1, y1 = bbox[t]
        for ty in range(y0 // th, (y1 - 1) // th + 1):
            for tx in range(x0 // tw, (x1 - 1) // tw + 1):
                assert t in seen[ty * num_tx + tx], (t, tx, ty)


def test_renderer_pallas_backend_matches():
    """The full Renderer with raster_backend='pallas' (interpreted on CPU)
    matches the XLA backend bit-for-bit in coverage/depth."""
    cfg_x = brt.RendererConfig(width=96, height=64, raster_backend="xla")
    cfg_p = brt.RendererConfig(width=96, height=64, raster_backend="pallas")
    rx = brt.Renderer(cfg_x)
    rp = brt.Renderer(cfg_p)
    pipe, mesh_x, uniforms, _ = demos.cube_demo(rx)
    _, mesh_p, _, _ = demos.cube_demo(rp)
    u = uniforms(0.5)
    fx = rx.render_frame(pipe, mesh_x, u)
    fp_ = rp.render_frame(pipe, mesh_p, u)
    np.testing.assert_array_equal(np.asarray(fx.tri_id), np.asarray(fp_.tri_id))
    np.testing.assert_array_equal(np.asarray(fx.depth_q), np.asarray(fp_.depth_q))
    np.testing.assert_allclose(fx.color_np(), fp_.color_np(), atol=1e-4)


def _many_tris_mesh(r, n=1500, seed=5):
    """n random small triangles as one mesh (soloist vertices, no indices)."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(-0.9, 0.9, size=(n, 1, 2)).astype(np.float32)
    d = rng.uniform(-0.05, 0.05, size=(n, 3, 2)).astype(np.float32)
    xy = (c + d).reshape(-1, 2)
    pos = np.concatenate(
        [xy, np.full((3 * n, 1), 0.5, np.float32), np.ones((3 * n, 1), np.float32)], -1
    )
    return r.upload_mesh(pos[:, :3], color=np.ones((3 * n, 3), np.float32))


def test_overflow_flag_surfaced():
    """A too-small pair budget must set FrameResult.overflowed, not
    silently drop triangles; a sufficient budget must not set it."""
    cfg = brt.RendererConfig(width=96, height=64, raster_backend="pallas")
    r = brt.Renderer(cfg)
    mesh = _many_tris_mesh(r)
    tight = brt.Pipeline(shader="ndc_color", raster_pairs_factor=0.01, near_clip=False)
    res = r.render_frame(tight, mesh, {})
    assert bool(res.overflowed)
    roomy = brt.Pipeline(shader="ndc_color", raster_pairs_factor=8.0, near_clip=False)
    res2 = r.render_frame(roomy, mesh, {})
    assert not bool(res2.overflowed)


def test_overflow_raises_in_debug():
    cfg = brt.RendererConfig(width=96, height=64, raster_backend="pallas", debug=True)
    r = brt.Renderer(cfg)
    mesh = _many_tris_mesh(r)
    tight = brt.Pipeline(shader="ndc_color", raster_pairs_factor=0.01, near_clip=False)
    from based_renderer_tpu.utils.errors import AllocationError

    with pytest.raises(AllocationError):
        r.render_frame(tight, mesh, {})


def test_two_pass_kernel_identical():
    """The two-pass (visibility + replay) kernel must be exactly identical
    to the single-pass kernel, planes included."""
    clip = random_clip(4, 40)
    W, H = 96, 64
    rng = np.random.default_rng(9)
    ch = jnp.asarray(rng.uniform(0, 1, size=(40, 3, 4)), jnp.float32)
    ts = setup_triangles(jnp.asarray(clip), W, H)
    for tile in [(128, 32), (128, 8)]:
        kw = dict(tile_w=tile[0], tile_h=tile[1], interpret=True, channels=ch)
        v1, i1, w1 = rasterize_vis_pallas(ts, W, H, **kw)
        v2, i2, w2 = rasterize_vis_pallas(ts, W, H, two_pass=True, **kw)
        for k in ("tri_id", "depth_q", "b0", "b1", "b2"):
            np.testing.assert_array_equal(
                np.asarray(getattr(v1, k)), np.asarray(getattr(v2, k))
            )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_two_pass_multidraw_init_chain():
    clip_a = random_clip(1, 10)
    clip_b = random_clip(2, 14)
    W, H = 96, 64
    ts_a = setup_triangles(jnp.asarray(clip_a), W, H)
    ts_b = setup_triangles(jnp.asarray(clip_b), W, H)
    vx = rasterize_vis(ts_a, W, H)
    vx = rasterize_vis(ts_b, W, H, init=vx, id_offset=10)
    vp = rasterize_vis_pallas(ts_a, W, H, interpret=True, two_pass=True)
    vp = rasterize_vis_pallas(ts_b, W, H, interpret=True, two_pass=True, init=vp, id_offset=10)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), np.asarray(vp.tri_id))
    np.testing.assert_array_equal(np.asarray(vx.depth_q), np.asarray(vp.depth_q))


# ---------------------------------------------------------------------------
# Batched-reduction kernel (raster_batch): bit-identity incl. tie semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compare", ["less", "less_equal", "greater", "greater_equal"])
def test_batched_matches_sequential(compare):
    clip = random_clip(11, 40)
    W, H = 96, 64
    clear = 0.5 if compare.startswith("greater") else 1.0
    ts = setup_triangles(jnp.asarray(clip), W, H)
    vs = rasterize_vis_pallas(
        ts, W, H, depth_compare=compare, depth_clear=clear, interpret=True
    )
    vb = rasterize_vis_pallas(
        ts, W, H, depth_compare=compare, depth_clear=clear, interpret=True, batch=8
    )
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(vs.depth_q), np.asarray(vb.depth_q))
    np.testing.assert_array_equal(np.asarray(vs.b2), np.asarray(vb.b2))


@pytest.mark.parametrize("compare", ["less", "less_equal", "greater", "greater_equal"])
def test_batched_equal_depth_ties(compare):
    """Coplanar identical triangles: the winner is decided purely by the
    tie-break (first for strict compares, last for *_equal) — the regime
    where a reduction could silently diverge from the sequential spec."""
    tri = np.asarray(
        [[[-0.5, -0.5, 0.3, 1], [0.5, -0.5, 0.3, 1], [0, 0.5, 0.3, 1]]], np.float32
    )
    clip = np.concatenate([tri] * 6)
    W, H = 96, 64
    clear = 0.0 if compare.startswith("greater") else 1.0
    ts = setup_triangles(jnp.asarray(clip), W, H)
    vs = rasterize_vis_pallas(
        ts, W, H, depth_compare=compare, depth_clear=clear, interpret=True
    )
    vb = rasterize_vis_pallas(
        ts, W, H, depth_compare=compare, depth_clear=clear, interpret=True, batch=4
    )
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    win = np.unique(np.asarray(vb.tri_id)[np.asarray(vb.tri_id) >= 0])
    assert win.size == 1  # the tie actually happened and one triangle won
    assert win[0] == (0 if compare in ("less", "greater") else 5)


def test_batched_init_chain_with_channels():
    clip_a, clip_b = random_clip(12, 16), random_clip(13, 24)
    rng = np.random.default_rng(14)
    ch_a = rng.normal(size=(16, 3, 5)).astype(np.float32)
    ch_b = rng.normal(size=(24, 3, 5)).astype(np.float32)
    W, H = 96, 64
    ts_a = setup_triangles(jnp.asarray(clip_a), W, H)
    ts_b = setup_triangles(jnp.asarray(clip_b), W, H)
    va, _, _ = rasterize_vis_pallas(
        ts_a, W, H, interpret=True, batch=8, channels=jnp.asarray(ch_a)
    )
    vb, ib, _ = rasterize_vis_pallas(
        ts_b, W, H, interpret=True, batch=8, channels=jnp.asarray(ch_b),
        init=va, id_offset=16,
    )
    sa, _, _ = rasterize_vis_pallas(ts_a, W, H, interpret=True, channels=jnp.asarray(ch_a))
    sb, isb, _ = rasterize_vis_pallas(
        ts_b, W, H, interpret=True, channels=jnp.asarray(ch_b), init=sa, id_offset=16
    )
    np.testing.assert_array_equal(np.asarray(vb.tri_id), np.asarray(sb.tri_id))
    np.testing.assert_array_equal(np.asarray(vb.depth_q), np.asarray(sb.depth_q))
    np.testing.assert_allclose(np.asarray(ib), np.asarray(isb), atol=1e-6)


def test_batched_rejects_ineligible_modes():
    clip = random_clip(15, 8)
    ts = setup_triangles(jnp.asarray(clip), 96, 64)
    with pytest.raises(ValueError):
        rasterize_vis_pallas(
            ts, 96, 64, depth_compare="not_equal", interpret=True, batch=8
        )


# ---------------------------------------------------------------------------
# Sublane-parallel kernel (raster_sublane): bit-identity incl. tie semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compare", ["less", "less_equal", "greater", "greater_equal"])
def test_sublane_matches_sequential(compare):
    clip = random_clip(21, 40)
    W, H = 96, 64
    clear = 0.5 if compare.startswith("greater") else 1.0
    ts = setup_triangles(jnp.asarray(clip), W, H)
    kw = dict(tile_w=128, tile_h=8, depth_compare=compare, depth_clear=clear, interpret=True)
    vs = rasterize_vis_pallas(ts, W, H, **kw)
    vb = rasterize_vis_pallas(ts, W, H, sublane=True, **kw)
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(vs.depth_q), np.asarray(vb.depth_q))
    m = np.asarray(vs.tri_id) >= 0
    for k in ("b0", "b1", "b2"):
        np.testing.assert_allclose(
            np.asarray(getattr(vs, k))[m], np.asarray(getattr(vb, k))[m], atol=1e-6
        )


@pytest.mark.parametrize("group", [16, 32])
@pytest.mark.parametrize("compare", ["less", "less_equal"])
def test_sublane_group_sizes(compare, group):
    """Wider record groups (raster_group) are a pure throughput knob:
    bit-identical coverage/depth/ties to the sequential kernel."""
    clip = np.concatenate(
        [random_clip(31, 40)]
        + [
            np.asarray(
                [[[-0.5, -0.5, 0.3, 1], [0.5, -0.5, 0.3, 1], [0, 0.5, 0.3, 1]]],
                np.float32,
            )
        ]
        * 37  # spans group boundaries of 16 and 32 with equal-depth ties
    )
    W, H = 96, 64
    ts = setup_triangles(jnp.asarray(clip), W, H)
    kw = dict(tile_w=128, tile_h=8, depth_compare=compare, interpret=True)
    vs = rasterize_vis_pallas(ts, W, H, **kw)
    vb = rasterize_vis_pallas(ts, W, H, sublane=True, sublane_group=group, **kw)
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(vs.depth_q), np.asarray(vb.depth_q))


@pytest.mark.parametrize("compare", ["less", "less_equal", "greater", "greater_equal"])
def test_sublane_equal_depth_ties(compare):
    """Coplanar identical triangles: the winner is decided purely by the
    tie-break (first for strict compares, last for *_equal)."""
    tri = np.asarray(
        [[[-0.5, -0.5, 0.3, 1], [0.5, -0.5, 0.3, 1], [0, 0.5, 0.3, 1]]], np.float32
    )
    clip = np.concatenate([tri] * 11)  # spans a group boundary (8)
    W, H = 96, 64
    clear = 0.0 if compare.startswith("greater") else 1.0
    ts = setup_triangles(jnp.asarray(clip), W, H)
    kw = dict(tile_w=128, tile_h=8, depth_compare=compare, depth_clear=clear, interpret=True)
    vs = rasterize_vis_pallas(ts, W, H, **kw)
    vb = rasterize_vis_pallas(ts, W, H, sublane=True, **kw)
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    win = np.unique(np.asarray(vb.tri_id)[np.asarray(vb.tri_id) >= 0])
    assert win.size == 1
    assert win[0] == (0 if compare in ("less", "greater") else 10)


def test_sublane_init_chain_with_channels():
    """Multi-draw chaining with varyings and a large id_offset (the f32
    triangle-id column must round-trip exactly)."""
    clip_a, clip_b = random_clip(22, 16), random_clip(23, 24)
    rng = np.random.default_rng(24)
    ch_a = rng.normal(size=(16, 3, 5)).astype(np.float32)
    ch_b = rng.normal(size=(24, 3, 5)).astype(np.float32)
    W, H = 96, 64
    big = 1_000_000  # exercises f32 tid exactness far above small ids
    ts_a = setup_triangles(jnp.asarray(clip_a), W, H)
    ts_b = setup_triangles(jnp.asarray(clip_b), W, H)
    kw = dict(tile_w=128, tile_h=8, interpret=True)
    va, ia, wa = rasterize_vis_pallas(
        ts_a, W, H, sublane=True, channels=jnp.asarray(ch_a), **kw
    )
    vb, ib, wb = rasterize_vis_pallas(
        ts_b, W, H, sublane=True, channels=jnp.asarray(ch_b),
        init=va, id_offset=big, **kw
    )
    sa, isa, _ = rasterize_vis_pallas(ts_a, W, H, channels=jnp.asarray(ch_a), **kw)
    sb, isb, wsb = rasterize_vis_pallas(
        ts_b, W, H, channels=jnp.asarray(ch_b), init=sa, id_offset=big, **kw
    )
    np.testing.assert_array_equal(np.asarray(vb.tri_id), np.asarray(sb.tri_id))
    np.testing.assert_array_equal(np.asarray(vb.depth_q), np.asarray(sb.depth_q))
    np.testing.assert_allclose(np.asarray(ib), np.asarray(isb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wb), np.asarray(wsb), atol=1e-6)


def test_sublane_rejects_ineligible_modes():
    clip = random_clip(25, 8)
    ts = setup_triangles(jnp.asarray(clip), 96, 64)
    with pytest.raises(ValueError):
        rasterize_vis_pallas(
            ts, 96, 64, depth_compare="not_equal", interpret=True, sublane=True
        )
    with pytest.raises(ValueError):
        rasterize_vis_pallas(
            ts, 96, 64, tile_w=64, tile_h=8, interpret=True, sublane=True
        )


def test_sublane_scissor_and_no_depth_clip():
    clip = random_clip(26, 24)
    W, H = 128, 64
    sc = (16, 8, 112, 56)
    ts = setup_triangles(jnp.asarray(clip), W, H)
    for kw in (dict(scissor=sc), dict(depth_clip=False), dict(scissor=sc, depth_clip=False)):
        vs = rasterize_vis_pallas(ts, W, H, tile_w=128, tile_h=8, interpret=True, **kw)
        vb = rasterize_vis_pallas(
            ts, W, H, tile_w=128, tile_h=8, interpret=True, sublane=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
        np.testing.assert_array_equal(np.asarray(vs.depth_q), np.asarray(vb.depth_q))


def test_sublane_empty_and_offscreen():
    W, H = 128, 32
    empty = np.zeros((0, 3, 4), np.float32)
    ts = setup_triangles(jnp.asarray(empty), W, H)
    v = rasterize_vis_pallas(ts, W, H, tile_w=128, tile_h=8, interpret=True, sublane=True)
    assert (np.asarray(v.tri_id) == -1).all()
    off = np.asarray(
        [[[5.0, 5.0, 0.5, 1.0], [6.0, 5.0, 0.5, 1.0], [5.0, 6.0, 0.5, 1.0]]], np.float32
    )
    ts2 = setup_triangles(jnp.asarray(off), W, H)
    v2 = rasterize_vis_pallas(ts2, W, H, tile_w=128, tile_h=8, interpret=True, sublane=True)
    assert (np.asarray(v2.tri_id) == -1).all()


def test_sublane_overflow_flag():
    clip = random_clip(27, 64)
    ts = setup_triangles(jnp.asarray(clip), 128, 64)
    out, of = rasterize_vis_pallas(
        ts, 128, 64, tile_w=128, tile_h=8, interpret=True, sublane=True,
        max_pairs=128, return_overflow=True,
    )
    assert bool(of)  # 64 spanning tris overflow a 128-pair budget


def test_slots_budget_identical_when_ample():
    """Slicing the sorted stream at an ample static budget is invisible:
    dead (culled/offscreen) slots sort to the tail, so every live pair
    survives and the render is bit-identical to the unsliced one."""
    clip = random_clip(31, 48)
    # Make some triangles dead so the tail is non-trivial: push a third
    # of them behind a cull via degenerate winding (swap two vertices).
    clip[::3] = clip[::3][:, [1, 0, 2]]
    W, H = 128, 64
    ts = setup_triangles(jnp.asarray(clip), W, H, cull_mode="back", front_face="ccw")
    base = rasterize_vis_pallas(ts, W, H, interpret=True)
    for slots in (256, 384):
        got, of = rasterize_vis_pallas(
            ts, W, H, interpret=True, slots=slots, return_overflow=True
        )
        assert not bool(of)
        np.testing.assert_array_equal(np.asarray(base.tri_id), np.asarray(got.tri_id))
        np.testing.assert_array_equal(np.asarray(base.depth_q), np.asarray(got.depth_q))


def test_slots_budget_overflow_flag():
    clip = random_clip(32, 200)
    W, H = 128, 64
    ts = setup_triangles(jnp.asarray(clip), W, H)
    _, of = rasterize_vis_pallas(
        ts, W, H, interpret=True, slots=64, return_overflow=True
    )
    assert bool(of)  # 200 live tris cannot fit 64 (rounded to 128) slots


def test_slots_factor_through_renderer():
    """The pipeline knob renders identically to the unbudgeted pipeline."""
    import dataclasses

    r = brt.Renderer(brt.RendererConfig(width=128, height=64, raster_backend="pallas"))
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.3)
    base = r.render_frame(pipe, mesh, u)
    spipe = dataclasses.replace(pipe, raster_slots_factor=40.0)  # 12 tris -> ample
    got = brt.Renderer(
        brt.RendererConfig(width=128, height=64, raster_backend="pallas")
    ).render_frame(spipe, mesh, u)
    np.testing.assert_array_equal(np.asarray(base.color_planar), np.asarray(got.color_planar))
    np.testing.assert_array_equal(np.asarray(base.tri_id), np.asarray(got.tri_id))
