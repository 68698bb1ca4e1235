"""Renderer API tests: demos, program cache, culling, MSAA, blending."""

import numpy as np
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos, geometry
from based_renderer_tpu.pipeline import DepthState, Pipeline


SMALL = brt.RendererConfig(width=96, height=64)


def covered(frame):
    return int((np.asarray(frame.tri_id) >= 0).sum())


def test_triangle_demo_coverage_exact():
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.triangle_demo(r)
    f = r.render_frame(pipe, mesh, uniforms(0.0))
    # NDC triangle spans half the screen in x and y: area = W/2 * H/2 / 2.
    assert covered(f) == SMALL.width * SMALL.height // 8
    # Constant reference color (0.1, 0.2, 0.3, 1.0) where covered.
    img = f.color_np()
    m = np.asarray(f.tri_id) >= 0
    np.testing.assert_allclose(
        img[m][:, :3], np.broadcast_to(np.float32([0.1, 0.2, 0.3]), img[m][:, :3].shape), atol=1e-6
    )


def test_cube_demo_renders_and_caches():
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    f0 = r.render_frame(pipe, mesh, uniforms(0.0))
    f1 = r.render_frame(pipe, mesh, uniforms(0.7))
    assert covered(f0) > 0 and covered(f1) > 0
    # Animation changed the image but not the compiled program count.
    assert not np.array_equal(f0.color_np(), f1.color_np())
    assert r.num_cached_programs == 1
    # A different pipeline state compiles a second program (the
    # vk::Pipeline-per-state analog).
    pipe2 = Pipeline(shader=pipe.shader, depth=DepthState(test=False, write=False))
    r.render_frame(pipe2, mesh, uniforms(0.0))
    assert r.num_cached_programs == 2


def test_cube_depth_occlusion():
    """With depth testing, far faces never overwrite near ones: every
    covered pixel's depth must be strictly less than the clear depth."""
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    f = r.render_frame(pipe, mesh, uniforms(0.4))
    d = np.asarray(f.depth_q)
    m = np.asarray(f.tri_id) >= 0
    assert (d[m] < 2**30).all()
    assert (d[~m] == 2**30).all()


def test_backface_cull_watertight():
    """Culling back faces of a closed mesh must not change the depth-tested
    image; culling front faces must."""
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    f_none = r.render_frame(pipe, mesh, uniforms(0.5))
    f_back = r.render_frame(
        Pipeline(shader=pipe.shader, depth=pipe.depth, cull_mode="back", front_face="ccw"),
        mesh,
        uniforms(0.5),
    )
    f_front = r.render_frame(
        Pipeline(shader=pipe.shader, depth=pipe.depth, cull_mode="front", front_face="ccw"),
        mesh,
        uniforms(0.5),
    )
    np.testing.assert_array_equal(f_none.color_np(), f_back.color_np())
    assert not np.array_equal(f_none.color_np(), f_front.color_np())


def test_textured_demo():
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.textured_cube_demo(r)
    f = r.render_frame(pipe, mesh, uniforms(0.6))
    assert covered(f) > 0
    img = f.color_np()
    covered_px = img[np.asarray(f.tri_id) >= 0]
    # Checkerboard: meaningful brightness variance across the surface.
    assert covered_px[:, :3].std() > 0.05


def test_instanced_demo():
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, instances = demos.instanced_demo(r, count=16)
    f = r.render_frame(pipe, mesh, uniforms(0.2), instances=instances)
    assert covered(f) > 0
    # More than one instance visible: multiple distinct colors.
    img = f.color_np()[np.asarray(f.tri_id) >= 0]
    assert len(np.unique(np.round(img[:, :3], 3), axis=0)) > 4


def test_big_mesh_demo_small():
    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=500)
    f = r.render_frame(pipe, mesh, uniforms(0.1))
    assert covered(f) > 0


def test_multi_draw_depth_interleave():
    """Two draws into one frame share the depth buffer: the second draw's
    nearer geometry wins, its farther geometry loses."""
    r = brt.Renderer(SMALL)
    tri = geometry.triangle_mesh_data()
    near = r.upload_mesh(tri["positions"] * np.float32([[2.0, 2.0, 0.0]]) + np.float32([[0, 0, 0.3]]))
    far = r.upload_mesh(tri["positions"] * np.float32([[2.0, 2.0, 0.0]]) + np.float32([[0, 0, 0.7]]))
    pipe_red = Pipeline(shader="flat_ndc")
    r.begin_frame(clear_color=(0, 0, 0, 1))
    r.draw(pipe_red, far, {"color": (1.0, 0.0, 0.0, 1.0)})
    r.draw(pipe_red, near, {"color": (0.0, 1.0, 0.0, 1.0)})
    f = r.end_frame()
    img = f.color_np()
    m = np.asarray(f.tri_id) >= 0
    # near (green) must fully occlude far (red): no red pixels remain.
    assert (img[m][:, 1] > 0.9).all()
    assert (img[m][:, 0] < 0.1).all()

    # Reversed draw order: depth test still keeps green in front.
    r.begin_frame(clear_color=(0, 0, 0, 1))
    r.draw(pipe_red, near, {"color": (0.0, 1.0, 0.0, 1.0)})
    r.draw(pipe_red, far, {"color": (1.0, 0.0, 0.0, 1.0)})
    f2 = r.end_frame()
    np.testing.assert_array_equal(f2.color_np(), img)


def test_msaa_resolve_edges():
    """MSAA-4x: edge pixels take intermediate values; interior identical."""
    cfg = brt.RendererConfig(width=96, height=64, msaa=4)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.triangle_demo(r)
    f = r.render_frame(pipe, mesh, uniforms(0.0))
    img = f.color_np()
    r1 = brt.Renderer(brt.RendererConfig(width=96, height=64))
    f1 = r1.render_frame(pipe, mesh, uniforms(0.0))
    img1 = f1.color_np()
    # Some pixels are partially covered (alpha strictly between bg and fg).
    frac = ((img[..., 2] > 0.05) & (img[..., 2] < 0.28)).sum()
    assert frac > 0
    # Aliased image has no such fractional pixels for a flat color.
    frac1 = ((img1[..., 2] > 1e-6) & (img1[..., 2] < 0.29)).sum()
    assert frac1 == 0


def test_alpha_blend():
    r = brt.Renderer(SMALL)
    tri = geometry.triangle_mesh_data()
    mesh = r.upload_mesh(tri["positions"] * np.float32([[2.0, 2.0, 0.0]]))
    blend = brt.BlendState(enable=True, src_factor="src_alpha", dst_factor="one_minus_src_alpha")
    pipe = Pipeline(shader="flat_ndc", blend=blend, depth=DepthState(test=False, write=False))
    r.begin_frame(clear_color=(0, 0, 1, 1))
    r.draw(pipe, mesh, {"color": (1.0, 0.0, 0.0, 0.5)})
    f = r.end_frame()
    img = f.color_np()
    m = np.asarray(f.tri_id) >= 0
    np.testing.assert_allclose(img[m][:, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(img[m][:, 2], 0.5, atol=1e-5)


def test_frame_misuse_raises():
    r = brt.Renderer(SMALL)
    with pytest.raises(brt.errors.FrameError):
        r.end_frame()
    tri = geometry.triangle_mesh_data()
    mesh = r.upload_mesh(tri["positions"])
    with pytest.raises(brt.errors.FrameError):
        r.draw(Pipeline(shader="flat_ndc"), mesh)
    r.begin_frame()
    with pytest.raises(brt.errors.FrameError):
        r.begin_frame()


def test_missing_attribute_raises():
    r = brt.Renderer(SMALL)
    tri = geometry.triangle_mesh_data()
    mesh = r.upload_mesh(tri["positions"])  # no color attribute
    r.begin_frame()
    with pytest.raises(brt.errors.DrawError):
        r.draw(Pipeline(shader="vertex_color"), mesh, {})


def test_unknown_shader_raises():
    with pytest.raises(KeyError):
        brt.shader.get("nope")


def test_scissor_rect():
    """Scissor clips coverage to the rect on both backends."""
    rect = (20, 10, 60, 40)
    for backend in ("xla", "pallas"):
        r = brt.Renderer(brt.RendererConfig(width=96, height=64, raster_backend=backend))
        pipe, mesh, uniforms, _ = demos.cube_demo(r)
        import dataclasses

        pipe_s = dataclasses.replace(pipe, scissor=rect)
        f = r.render_frame(pipe_s, mesh, uniforms(0.5))
        m = np.asarray(f.tri_id) >= 0
        assert m.any()
        ys, xs = np.where(m)
        assert xs.min() >= rect[0] and xs.max() < rect[2]
        assert ys.min() >= rect[1] and ys.max() < rect[3]
        # Inside the rect the image matches the unscissored render.
        f0 = r.render_frame(pipe, mesh, uniforms(0.5))
        a = f.color_np()[rect[1] : rect[3], rect[0] : rect[2]]
        b = f0.color_np()[rect[1] : rect[3], rect[0] : rect[2]]
        np.testing.assert_array_equal(a, b)


def test_indexed_upload_deindexes_equivalently():
    """upload_mesh(indices=...) de-indexes at upload; the frame must be
    identical to uploading the pre-expanded corners (triangle order, ids,
    depth, color)."""
    import numpy as np
    import jax.numpy as jnp
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import geometry

    data = geometry.procedural_mesh_data(600)
    pos = np.asarray(data["positions"]); nrm = np.asarray(data["normal"])
    idx = np.asarray(data["indices"]).reshape(-1, 3)
    r = brt.Renderer(brt.RendererConfig(width=96, height=64, raster_backend="pallas"))
    m_idx = r.upload_mesh(pos, indices=idx, normal=nrm)
    assert m_idx.indices is None  # de-indexed at upload
    flat = idx.reshape(-1)
    m_seq = r.upload_mesh(pos[flat], normal=nrm[flat])
    from based_renderer_tpu.models import demos
    pipe, _, uniforms, _ = demos.big_mesh_demo(r, triangles=600)
    u = uniforms(0.4)
    fa = r.render_frame(pipe, m_idx, u)
    fb = r.render_frame(pipe, m_seq, u)
    np.testing.assert_array_equal(np.asarray(fa.tri_id), np.asarray(fb.tri_id))
    np.testing.assert_array_equal(np.asarray(fa.depth_q), np.asarray(fb.depth_q))
    np.testing.assert_array_equal(fa.color_np(), fb.color_np())


def test_kernel_fallback_signals():
    """A requested-but-ineligible fast raster variant warns (raises in
    debug) instead of silently falling back to the sequential kernel."""
    import dataclasses
    import warnings

    cfg = brt.RendererConfig(width=256, height=128, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    bad = dataclasses.replace(
        pipe,
        raster_sublane=True,
        depth=DepthState(test=False, write=False),
    )
    with pytest.warns(RuntimeWarning, match="raster_sublane"):
        r.render_frame(bad, mesh, uniforms(0.0))
    bad_batch = dataclasses.replace(
        pipe, raster_batch=8, depth=DepthState(compare="not_equal")
    )
    with pytest.warns(RuntimeWarning, match="raster_batch"):
        r.render_frame(bad_batch, mesh, uniforms(0.0))
    # An eligible draw stays quiet.
    ok = dataclasses.replace(pipe, raster_sublane=True, raster_tile=(128, 8))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r.render_frame(ok, mesh, uniforms(0.0))
    # Debug mode raises instead.
    rd = brt.Renderer(dataclasses.replace(cfg, debug=True))
    with pytest.raises(brt.errors.DrawError, match="ineligible"):
        rd.render_frame(bad, mesh, uniforms(0.0))


def test_render_sequence_multi_matches_per_frame():
    """A 2-draw blended animation through the batched lax.scan schedule
    must match per-frame rendering exactly."""
    import jax

    r = brt.Renderer(SMALL)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    tri = r.upload_mesh(geometry.triangle_mesh_data()["positions"])
    blend_pipe = Pipeline(
        shader="flat_ndc",
        depth=DepthState(test=False, write=False),
        blend=brt.BlendState(
            enable=True, src_factor="src_alpha", dst_factor="one_minus_src_alpha"
        ),
    )
    times = [0.0, 0.4, 0.9]
    useq1 = jax.tree.map(lambda *xs: jnp.stack(xs), *[uniforms(t) for t in times])
    alphas = jnp.asarray(
        [[1, 0, 0, 0.3], [0, 1, 0, 0.5], [0, 0, 1, 0.8]], jnp.float32
    )
    sums, frames = r.render_sequence_multi(
        [
            {"pipeline": pipe, "mesh": mesh, "uniforms_seq": useq1},
            {"pipeline": blend_pipe, "mesh": tri, "uniforms_seq": {"color": alphas}},
        ],
        return_frames=True,
    )
    assert len(set(np.round(np.asarray(sums), 3))) == len(times)
    for k, t in enumerate(times):
        r.begin_frame()
        r.draw(pipe, mesh, uniforms(t))
        r.draw(blend_pipe, tri, {"color": alphas[k]})
        f = r.end_frame()
        np.testing.assert_array_equal(
            np.asarray(frames[k]), np.asarray(f.color_planar)
        )


def test_framebuffer_srgb_applies_at_color_u8():
    """framebuffer_srgb encodes presented bytes with the sRGB transfer
    function (alpha linear) while device-side shading stays linear."""
    from based_renderer_tpu.utils import image

    lin = brt.Renderer(SMALL)
    enc = brt.Renderer(brt.RendererConfig(width=96, height=64, framebuffer_srgb=True))
    pipe, mesh, uniforms, _ = demos.triangle_demo(lin)
    fl = lin.render_frame(pipe, mesh, uniforms(0.0))
    pipe2, mesh2, uniforms2, _ = demos.triangle_demo(enc)
    fe = enc.render_frame(pipe2, mesh2, uniforms2(0.0))
    # Linear (device) output is identical; only the u8 encode differs.
    np.testing.assert_array_equal(np.asarray(fl.color_planar), np.asarray(fe.color_planar))
    np.testing.assert_array_equal(fe.color_u8(), image.to_u8(fl.color_np(), srgb=True))
    # The covered constant (0.1, 0.2, 0.3) brightens under the transfer
    # function: 0.1 -> 89/255 vs linear 26/255.
    m = np.asarray(fe.tri_id) >= 0
    assert fe.color_u8()[m][0, 0] == 89
    assert fl.color_u8()[m][0, 0] == 26
