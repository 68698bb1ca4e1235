"""Present layer and batched frame sequences."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import based_renderer_tpu as brt
from based_renderer_tpu import present
from based_renderer_tpu.models import demos


def test_swapchain_ring_order():
    chain = present.Swapchain(depth=2)

    class F:
        def __init__(self, i):
            self.color = jnp.full((2, 2, 4), float(i))

    assert chain.submit(F(0)) is None  # warming up
    img1 = chain.submit(F(1))
    assert img1 is not None and float(img1[0, 0, 0]) == 0.0  # oldest first
    img2 = chain.submit(F(2))
    assert float(img2[0, 0, 0]) == 1.0
    rest = chain.flush()
    assert [float(r[0, 0, 0]) for r in rest] == [2.0]
    assert chain.presented == 3


def test_frame_pacer_fixed_dt():
    pacer = present.FramePacer(fixed_dt=0.25)
    ts = [pacer.tick() for _ in range(4)]
    np.testing.assert_allclose(ts, [0.25, 0.5, 0.75, 1.0])


def test_render_loop_end_to_end():
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    demo = demos.cube_demo(r)
    seen = []
    last, pacer = present.render_loop(
        r, demo, frames=4, on_frame=lambda img, p: seen.append(img.shape)
    )
    assert last is not None and last.shape == (48, 64, 4)
    # Every frame must reach on_frame, including the depth-2 swapchain's
    # final in-flight frames drained after the loop (regression: the
    # drain used to skip on_frame, losing the last `depth` presents).
    assert len(seen) == 4


def test_render_loop_single_frame_presents():
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    demo = demos.triangle_demo(r)
    seen = []
    last, _ = present.render_loop(
        r, demo, frames=1, on_frame=lambda img, p: seen.append(img.shape)
    )
    assert len(seen) == 1 and last is not None


def test_render_sequence_matches_frames():
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    useq = jax.tree.map(lambda *xs: jnp.stack(xs), *[uniforms(0.3 * i) for i in range(4)])
    sums, colors = r.render_sequence(pipe, mesh, useq, return_frames=True)
    assert colors.shape == (4, 4, 48, 64)  # (N, C, H, W): planar device layout
    for i in range(4):
        f = r.render_frame(pipe, mesh, uniforms(0.3 * i))
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(colors[i]), 0, -1), f.color_np(), atol=1e-6
        )
        assert abs(float(sums[i]) - float(jnp.sum(f.color))) < 1e-2


def test_render_sequence_cache_and_mesh_identity():
    """Sequence programs closure-capture the mesh (measured ~24 ms/frame
    cheaper than jit parameters on 1M-tri scenes — see renderer.py): the
    cache must be stable across calls with the same mesh, and a swapped
    mesh (same shapes, new arrays) must get a NEW program that renders
    the new data, not the captured old one."""
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    useq = jax.tree.map(lambda *xs: jnp.stack(xs), *[uniforms(0.3 * i) for i in range(3)])
    sums1 = r.render_sequence(pipe, mesh, useq)
    n0 = r.num_cached_programs
    sums1b = r.render_sequence(pipe, mesh, useq)
    assert r.num_cached_programs == n0  # same mesh => cache hit
    np.testing.assert_array_equal(np.asarray(sums1), np.asarray(sums1b))

    # Same geometry scaled down: same shapes/dtypes, different arrays.
    small = r.upload_mesh(
        np.asarray(mesh.attributes["position"]) * 0.5,
        color=np.asarray(mesh.attributes["color"]),
    )
    sums2 = r.render_sequence(pipe, small, useq)
    assert r.num_cached_programs == n0 + 1  # new mesh => new program
    f = r.render_frame(pipe, small, uniforms(0.0))
    assert abs(float(sums2[0]) - float(jnp.sum(f.color))) < 1e-2
    assert not np.allclose(np.asarray(sums1), np.asarray(sums2))


def test_render_sequence_uniforms_fn_matches_seq():
    """Device-side uniforms (uniforms_fn traced into the scan) must render
    the SAME frames as host-stacked uniforms_seq at the same times, for a
    plain and an instanced demo (the latter exercises traced trig)."""
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    for demo, inst_count in ((demos.cube_demo, None), (demos.instanced_demo, 16)):
        if inst_count is None:
            pipe, mesh, uniforms, inst = demo(r)
        else:
            pipe, mesh, uniforms, inst = demo(r, count=inst_count)
        dt = 0.25
        useq = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[uniforms(i * dt) for i in range(3)]
        )
        s_seq = np.asarray(r.render_sequence(pipe, mesh, useq, instances=inst))
        s_fn = np.asarray(
            r.render_sequence(
                pipe, mesh, instances=inst,
                uniforms_fn=uniforms, num_frames=3, t0=0.0, dt=dt,
            )
        )
        np.testing.assert_allclose(s_fn, s_seq, rtol=2e-6)
        # t0/dt are traced: shifting the phase must not grow the cache.
        n0 = r.num_cached_programs
        s_fn2 = np.asarray(
            r.render_sequence(
                pipe, mesh, instances=inst,
                uniforms_fn=uniforms, num_frames=3, t0=0.1, dt=dt,
            )
        )
        assert r.num_cached_programs == n0
        assert not np.allclose(s_fn2, s_fn)


def test_render_sequence_empty_uniforms_needs_count():
    r = brt.Renderer(brt.RendererConfig(width=32, height=32))
    pipe, mesh, uniforms, _ = demos.triangle_demo(r)
    import pytest

    with pytest.raises(brt.errors.FrameError):
        r.render_sequence(pipe, mesh, {})
    sums = r.render_sequence(pipe, mesh, {}, num_frames=3)
    assert np.asarray(sums).shape == (3,)


def test_persistent_cache_util(tmp_path):
    from based_renderer_tpu.utils import cache

    d = cache.enable_persistent_cache(str(tmp_path / "xla"))
    assert d and (tmp_path / "xla").exists()


def test_swapchain_arena_staging_and_resize():
    """Presented frames land in the native arena staging pool; resize
    rebuilds it (the swapchain-recreation analog)."""
    from based_renderer_tpu import runtime
    from based_renderer_tpu.present import Swapchain
    from based_renderer_tpu.utils.errors import PresentError

    class FakeFrame:
        def __init__(self, w, h, v):
            self._img = np.full((h, w, 4), v, np.float32)

        def color_np(self):
            return self._img

    chain = Swapchain(depth=2, extent=(16, 8))
    assert chain.submit(FakeFrame(16, 8, 0.1)) is None
    img = chain.submit(FakeFrame(16, 8, 0.2))
    assert img is not None and img.shape == (8, 16, 4)
    if runtime.available():
        assert chain._staging is not None  # arena pool actually in use
        with pytest.raises(PresentError):
            chain.submit(FakeFrame(4, 4, 0.3))
            chain.submit(FakeFrame(4, 4, 0.3))
            chain.flush()
        chain = Swapchain(depth=2, extent=(16, 8))
    chain.resize((4, 4))
    chain.submit(FakeFrame(4, 4, 0.4))
    out = chain.flush()
    assert out[-1].shape == (4, 4, 4)


def test_swapchain_rejects_non_frames():
    from based_renderer_tpu.present import Swapchain
    from based_renderer_tpu.utils.errors import PresentError

    with pytest.raises(PresentError):
        Swapchain(depth=1).submit(42)


def test_render_loop_with_stage_timer():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    from based_renderer_tpu.present import render_loop
    from based_renderer_tpu.utils.profiling import StageTimer

    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    timer = StageTimer()
    last, pacer = render_loop(r, demos.cube_demo(r), frames=4, timer=timer)
    assert last is not None and last.shape == (48, 64, 4)
    assert timer.counts["record+dispatch"] == 4
    assert "present" in timer.report()


def test_renderer_resize():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    f1 = r.render_frame(pipe, mesh, uniforms(0.1))
    assert f1.color_np().shape == (48, 64, 4)
    r.resize(32, 24)
    f2 = r.render_frame(pipe, mesh, uniforms(0.1))
    assert f2.color_np().shape == (24, 32, 4)
    r.resize(64, 48)  # previous extent: program cache hit
    n = r.num_cached_programs
    r.render_frame(pipe, mesh, uniforms(0.1))
    assert r.num_cached_programs == n


def test_debug_draw_validation():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import geometry
    from based_renderer_tpu.utils.errors import DrawError, ShaderError

    r = brt.Renderer(brt.RendererConfig(width=32, height=32, debug=True))
    data = geometry.cube_mesh_data()
    # Out-of-bounds index: caught at upload (meshes de-index there)...
    with pytest.raises(ValueError, match="out of bounds"):
        r.upload_mesh(data["positions"][:30], indices=np.asarray([[0, 1, 99]]))
    # ...and at draw time for directly-constructed indexed meshes.
    from based_renderer_tpu.scene import Mesh
    import jax.numpy as jnp

    mesh = Mesh(
        attributes={"position": jnp.asarray(data["positions"][:30], jnp.float32)},
        indices=jnp.asarray([[0, 1, 99]], jnp.int32),
    )
    pipe = brt.Pipeline(shader="flat_mvp")
    r.begin_frame()
    with pytest.raises(DrawError, match="out of bounds"):
        r.draw(pipe, mesh, {})
    r._in_frame = False
    # Unknown shader raises the typed ShaderError (still a KeyError)
    with pytest.raises(ShaderError):
        brt.shader.get("nope")
