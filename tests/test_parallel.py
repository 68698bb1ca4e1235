"""SPMD tile-parallel rendering on the virtual 8-device CPU mesh.

The tiled render must be *bit-identical* in coverage/depth to the
single-device render — the spec computes everything in global pixel
coordinates precisely so that the device partition is invisible.  The
tiled path runs the FULL frame program per shard (multi-draw, blending,
stencil, coverage MSAA, Pallas rasterization).
"""

import dataclasses

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos, geometry
from based_renderer_tpu.pipeline import BlendState, DepthState, Pipeline, StencilState
from based_renderer_tpu.parallel import TiledRenderer


W, H = 96, 64

# Every test here jit-compiles an 8-device shard_map frame program on the
# 1-core CI host — minutes each.  The smoke tier skips them:
#     python -m pytest tests/ -q -m "not slow"
pytestmark = pytest.mark.slow


def mesh_2d(ny, nx, extra=None):
    devs = np.array(jax.devices()[: ny * nx * (extra or 1)])
    if extra:
        return Mesh(devs.reshape(ny, nx, extra), ("y", "x", "g"))
    return Mesh(devs.reshape(ny, nx), ("y", "x"))


def assert_tiled_matches(cfg, tr, sf, color, depth_q, tri_id, color_atol):
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(depth_q))
    np.testing.assert_allclose(
        sf.color_np(), np.moveaxis(np.asarray(color), 0, -1), atol=color_atol
    )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("ny,nx", [(2, 4), (8, 1)])
def test_tiled_matches_single_device(backend, ny, nx):
    cfg = brt.RendererConfig(width=W, height=H, raster_backend=backend)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.5)
    sf = r.render_frame(pipe, mesh, u)

    tr = TiledRenderer(cfg, mesh_2d(ny, nx))
    color, depth_q, tri_id = tr.render(pipe, mesh, u)
    # Coverage and depth are bit-identical (the spec contract); color can
    # differ in float low bits (plane re-anchoring at shard-local tile
    # origins), so compare with small slack.
    assert_tiled_matches(cfg, tr, sf, color, depth_q, tri_id, 1e-5)


def test_geometry_parallel_matches():
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.8)
    sf = r.render_frame(pipe, mesh, u)

    tr = TiledRenderer(cfg, mesh_2d(2, 2, extra=2), geometry_axis="g")
    color, depth_q, tri_id = tr.render(pipe, mesh, u)
    assert_tiled_matches(cfg, tr, sf, color, depth_q, tri_id, 1e-5)


def test_tiled_output_is_sharded():
    cfg = brt.RendererConfig(width=W, height=H)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    tr = TiledRenderer(cfg, mesh_2d(2, 4))
    out, _, _ = tr.render(pipe, mesh, uniforms(0.1))
    # The image lives sharded across the device mesh — no implicit gather.
    assert len(out.sharding.device_set) == 8


def test_tiled_multidraw_blend_matches():
    """Two-draw frame with alpha blending, end-to-end over the mesh."""
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    data = geometry.cube_mesh_data()
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    tri = r.upload_mesh(
        geometry.triangle_mesh_data()["positions"],
        color=np.tile(np.float32([[1, 0, 0]]), (3, 1)),
    )
    blend_pipe = Pipeline(
        shader="ndc_color",
        depth=DepthState(test=False, write=False),
        blend=BlendState(enable=True, src_factor="src_alpha",
                         dst_factor="one_minus_src_alpha"),
    )
    u = uniforms(0.4)

    def record(target):
        target.begin_frame()
        target.draw(pipe, mesh, u)
        target.draw(blend_pipe, tri, {})
        return target.end_frame()

    sf = record(r)
    tf = record(TiledRenderer(cfg, mesh_2d(2, 4)))
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tf.tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(tf.depth_q))
    np.testing.assert_allclose(sf.color_np(), tf.color_np(), atol=1e-5)


def test_tiled_msaa_coverage_matches():
    cfg = brt.RendererConfig(width=W, height=H, msaa=4, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.6)
    sf = r.render_frame(pipe, mesh, u)
    assert np.asarray(sf.tri_id).shape == (4, H, W)

    tr = TiledRenderer(cfg, mesh_2d(2, 2))
    tf = tr.begin_frame() or tr
    tr.draw(pipe, mesh, u)
    tf = tr.end_frame()
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tf.tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(tf.depth_q))
    np.testing.assert_allclose(sf.color_np(), tf.color_np(), atol=1e-5)


def test_tiled_stencil_matches():
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    tri = geometry.triangle_mesh_data()["positions"]
    mesh_a = r.upload_mesh(tri * np.float32(0.6))
    mesh_b = r.upload_mesh(tri)
    stamp = Pipeline(
        shader="flat_ndc", depth=DepthState(test=False, write=False),
        stencil=StencilState(enable=True, compare="always", ref=1, pass_op="replace"),
    )
    masked = Pipeline(
        shader="flat_ndc", depth=DepthState(test=False, write=False),
        stencil=StencilState(enable=True, compare="equal", ref=1),
    )

    def record(target):
        target.begin_frame()
        target.draw(stamp, mesh_a, {"color": (1.0, 0.0, 0.0, 1.0)})
        target.draw(masked, mesh_b, {"color": (0.0, 1.0, 0.0, 1.0)})
        return target.end_frame()

    sf = record(r)
    tf = record(TiledRenderer(cfg, mesh_2d(2, 4)))
    np.testing.assert_array_equal(np.asarray(sf.stencil), np.asarray(tf.stencil))
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tf.tri_id))
    np.testing.assert_allclose(sf.color_np(), tf.color_np(), atol=1e-5)


@pytest.mark.parametrize(
    "compare,write,clear",
    [
        ("greater", True, 0.0),  # max-depth compositing
        ("less_equal", True, 1.0),  # later draw wins exact-depth ties
        ("always", True, 1.0),  # draw-order winner, depth written
        ("less", False, 1.0),  # order merge: pass set vs static clear
    ],
)
def test_geometry_parallel_compare_modes(compare, write, clear):
    """The depth-compositing collective must honor the pipeline's depth
    state, not assume min-depth/lowest-id (round-1 advisor finding)."""
    cfg = brt.RendererConfig(
        width=W, height=H, clear_depth=clear, raster_backend="pallas"
    )
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    pipe = dataclasses.replace(
        pipe, depth=dataclasses.replace(pipe.depth, compare=compare, write=write)
    )
    u = uniforms(0.8)
    sf = r.render_frame(pipe, mesh, u, clear_depth=clear)

    tr = TiledRenderer(cfg, mesh_2d(2, 2, extra=2), geometry_axis="g")
    color, depth_q, tri_id = tr.render(pipe, mesh, u)
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(depth_q))


def test_geometry_parallel_not_equal_rejected():
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    pipe = dataclasses.replace(
        pipe, depth=dataclasses.replace(pipe.depth, compare="not_equal")
    )
    tr = TiledRenderer(cfg, mesh_2d(2, 2, extra=2), geometry_axis="g")
    with pytest.raises(ValueError, match="not_equal"):
        tr.render(pipe, mesh, uniforms(0.8))


def test_geometry_parallel_instanced_batched():
    """Geometry axis + instancing + the batched-reduction kernel."""
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, inst = demos.instanced_demo(r, count=64)
    pipe = dataclasses.replace(pipe, raster_batch=8)
    u = uniforms(0.3)
    sf = r.render_frame(pipe, mesh, u, instances=inst)

    tr = TiledRenderer(cfg, mesh_2d(2, 2, extra=2), geometry_axis="g")
    color, depth_q, tri_id = tr.render(pipe, mesh, u, instances=inst)
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(depth_q))
    np.testing.assert_allclose(
        sf.color_np(), np.moveaxis(np.asarray(color), 0, -1), atol=1e-5
    )


def test_geometry_parallel_instanced_sublane():
    """Geometry axis + instancing + the sublane-parallel kernel.

    Shards must be 128 px wide for the sublane kernel to engage (the
    renderer silently falls back to the sequential kernel otherwise), so
    this test uses a 256-wide framebuffer over a 1x2 tile mesh.
    """
    cfg = brt.RendererConfig(width=256, height=32, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, inst = demos.instanced_demo(r, count=48)
    pipe = dataclasses.replace(pipe, raster_sublane=True, raster_tile=(128, 8))
    u = uniforms(0.3)
    sf = r.render_frame(pipe, mesh, u, instances=inst)

    tr = TiledRenderer(cfg, mesh_2d(1, 2, extra=2), geometry_axis="g")
    color, depth_q, tri_id = tr.render(pipe, mesh, u, instances=inst)
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(depth_q))
    np.testing.assert_allclose(
        sf.color_np(), np.moveaxis(np.asarray(color), 0, -1), atol=1e-5
    )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_tiled_scissor_matches(backend):
    """Scissor on the tiled path (post-select in global coords) is
    bit-identical to the single-device in-kernel scissor mask."""
    rect = (20, 10, 60, 40)
    cfg = brt.RendererConfig(width=W, height=H, raster_backend=backend)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    spipe = dataclasses.replace(pipe, scissor=rect)
    u = uniforms(0.5)
    sf = r.render_frame(spipe, mesh, u)
    tr = TiledRenderer(cfg, mesh_2d(2, 4))
    color, depth_q, tri_id = tr.render(spipe, mesh, u)
    assert_tiled_matches(cfg, tr, sf, color, depth_q, tri_id, 1e-5)
    # The rect actually clipped something.
    cov = np.asarray(tri_id) >= 0
    assert cov.any()
    assert not cov[: rect[1]].any() and not cov[rect[3]:].any()


def test_tiled_debug_validation():
    """TiledRenderer honors config.debug: binner overflow raises the same
    AllocationError as the single-device renderer."""
    cfg = brt.RendererConfig(
        width=W, height=H, raster_backend="pallas", debug=True
    )
    r = brt.Renderer(cfg)
    # Enough triangles that the binner's 1024-pair floor overflows.
    pipe, mesh, uniforms, inst = demos.instanced_demo(r, count=500)
    # sublane off: the shard extent clamps tile_w below 128, which in
    # debug mode raises its own (correct) ineligibility DrawError first.
    tiny = dataclasses.replace(
        pipe, raster_pairs_factor=0.0001, raster_sublane=False
    )
    tr = TiledRenderer(cfg, mesh_2d(2, 4))
    tr.begin_frame()
    tr.draw(tiny, mesh, uniforms(0.2), inst)
    with pytest.raises(brt.errors.AllocationError):
        tr.end_frame()


def test_tiled_render_sequence_matches():
    """The sharded lax.scan schedule: global per-frame checksums and
    sharded frames must match single-device render_sequence."""
    import jax.numpy as jnp

    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    times = [0.0, 0.5, 1.1]
    useq = jax.tree.map(lambda *xs: jnp.stack(xs), *[uniforms(t) for t in times])
    sums_s, frames_s = r.render_sequence(pipe, mesh, useq, return_frames=True)

    tr = TiledRenderer(cfg, mesh_2d(2, 4))
    sums_t, frames_t = tr.render_sequence(pipe, mesh, useq, return_frames=True)
    np.testing.assert_allclose(
        np.asarray(sums_t), np.asarray(sums_s), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(frames_t), np.asarray(frames_s), atol=1e-5
    )


def test_tiled_render_sequence_uniforms_fn_matches():
    """Device-side uniforms (uniforms_fn/t0/dt) on the tiled path: global
    checksums must match single-device render_sequence running the SAME
    uniforms_fn schedule (round-4 parity item — the multi-chip path runs
    the exact schedule the flagship bench uses)."""
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    t0, dt, n = 0.25, 0.037, 4
    sums_s = r.render_sequence(
        pipe, mesh, uniforms_fn=uniforms, num_frames=n, t0=t0, dt=dt
    )

    tr = TiledRenderer(cfg, mesh_2d(2, 4))
    sums_t = tr.render_sequence(
        pipe, mesh, uniforms_fn=uniforms, num_frames=n, t0=t0, dt=dt
    )
    got_s, got_t = np.asarray(sums_s), np.asarray(sums_t)
    assert got_s.shape == (n,)
    # Frames must be distinct (the schedule actually advanced time).
    assert len(set(np.round(got_s, 3))) == n
    np.testing.assert_allclose(got_t, got_s, rtol=1e-5)
