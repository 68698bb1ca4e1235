"""Near-plane clipping tests."""

import numpy as np
import jax.numpy as jnp

import based_renderer_tpu as brt
from based_renderer_tpu.models import geometry
from based_renderer_tpu.ops.clip import clip_near
from based_renderer_tpu.ops.raster_xla import rasterize_vis
from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.pipeline import DepthState, Pipeline


def area2(p):
    """Signed 2D area (x, y of clip, assuming w ~ const) for orientation."""
    return (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) - (p[1, 1] - p[0, 1]) * (
        p[2, 0] - p[0, 0]
    )


def test_fully_inside_passthrough():
    clip = np.array([[[-0.5, 0.5, 0.2, 1.0], [0.5, 0.5, 0.2, 1.0], [0, -0.5, 0.2, 1.0]]], np.float32)
    out, var = clip_near(jnp.asarray(clip), {"c": jnp.ones((1, 3, 2))})
    out = np.asarray(out)
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(out[0], clip[0])
    # Second slot degenerate.
    assert np.ptp(out[1], axis=0).max() == 0


def test_fully_behind_dropped():
    clip = np.array([[[0, 0, 0, -1.0], [1, 0, 0, -1.0], [0, 1, 0, -2.0]]], np.float32)
    out, _ = clip_near(jnp.asarray(clip), {})
    out = np.asarray(out)
    for s in range(2):
        assert np.ptp(out[s], axis=0).max() == 0  # both degenerate


def test_one_vertex_inside():
    clip = np.array(
        [[[0.0, 0.0, 0.5, 1.0], [1.0, 0.0, 0.5, -1.0], [0.0, 1.0, 0.5, -1.0]]], np.float32
    )
    out, _ = clip_near(jnp.asarray(clip), {}, eps=1e-5)
    out = np.asarray(out)
    # One real triangle; all ws >= eps.
    assert (out[0][:, 3] >= 1e-5 - 1e-7).all()
    assert np.ptp(out[1], axis=0).max() == 0
    # The inside vertex is preserved.
    assert any(np.allclose(out[0][i], clip[0, 0]) for i in range(3))


def test_two_vertices_inside_winding_preserved():
    clip = np.array(
        [[[-1.0, 0.0, 0.5, 1.0], [1.0, 0.0, 0.5, 1.0], [0.0, 1.0, 0.5, -0.5]]], np.float32
    )
    out, _ = clip_near(jnp.asarray(clip), {})
    out = np.asarray(out)
    # Two real triangles, same orientation as the input.
    sign_in = np.sign(area2(clip[0]))
    for s in range(2):
        assert np.ptp(out[s], axis=0).max() > 0
        assert (out[s][:, 3] >= 1e-5 - 1e-7).all()
        assert np.sign(area2(out[s])) == sign_in


def test_varyings_lerped():
    clip = np.array(
        [[[0.0, 0.0, 0.0, 1.0], [2.0, 0.0, 0.0, -1.0], [0.0, 2.0, 0.0, -1.0]]], np.float32
    )
    col = np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], np.float32)
    out, var = clip_near(jnp.asarray(clip), {"color": jnp.asarray(col)}, eps=0.0)
    c = np.asarray(var["color"])[0]
    # Cut at t = 0.5 along both edges: colors are midpoints.
    mids = {tuple(np.round(x, 3)) for x in c}
    assert (1.0, 0.0, 0.0) in mids
    assert (0.5, 0.5, 0.0) in mids
    assert (0.5, 0.0, 0.5) in mids


def test_renderer_clips_partially_behind_geometry():
    """A triangle poking through the camera plane renders its in-front part
    instead of disappearing."""
    from based_renderer_tpu import math3d

    r = brt.Renderer(brt.RendererConfig(width=64, height=64))
    # A floor-like triangle straddling the camera plane: two vertices well
    # in front (z = +2), one behind the camera (z = -1).
    pos = np.array(
        [[-1.0, 0.3, 2.0], [1.0, 0.3, 2.0], [0.0, 0.3, -1.0]], np.float32
    )
    mesh = r.upload_mesh(pos)
    uniforms = {
        "model": np.eye(4, dtype=np.float32),
        "view": np.eye(4, dtype=np.float32),
        "proj": np.asarray(math3d.perspective(np.radians(90.0), 1.0, 0.1, 10.0)),
    }
    pipe_clip = Pipeline(shader="flat_mvp", depth=DepthState(test=False, write=False))
    pipe_noclip = Pipeline(
        shader="flat_mvp", depth=DepthState(test=False, write=False), near_clip=False
    )
    f_clip = r.render_frame(pipe_clip, mesh, uniforms)
    f_noclip = r.render_frame(pipe_noclip, mesh, uniforms)
    assert (np.asarray(f_clip.tri_id) >= 0).sum() > 0, "clipped part should render"
    assert (np.asarray(f_noclip.tri_id) >= 0).sum() == 0, "w<0 triangle dropped without clip"
