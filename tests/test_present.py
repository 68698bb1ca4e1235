"""Present layer and batched frame sequences."""

import numpy as np
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
    assert len(seen) >= 2


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
