"""SPMD tile-parallel rendering on the virtual 8-device CPU mesh.

The tiled render must be *bit-identical* to the single-device render —
the spec computes everything in global pixel coordinates precisely so
that the device partition is invisible.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos
from based_renderer_tpu.parallel import TiledRenderer


W, H = 96, 64


def mesh_2d(ny, nx, extra=None):
    devs = np.array(jax.devices()[: ny * nx * (extra or 1)])
    if extra:
        return Mesh(devs.reshape(ny, nx, extra), ("y", "x", "g"))
    return Mesh(devs.reshape(ny, nx), ("y", "x"))


@pytest.mark.parametrize("ny,nx", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_tiled_matches_single_device(ny, nx):
    cfg = brt.RendererConfig(width=W, height=H)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.5)
    sf = r.render_frame(pipe, mesh, u)

    tr = TiledRenderer(cfg, mesh_2d(ny, nx))
    color, depth_q, tri_id = tr.render(pipe, mesh, u)
    # Coverage and depth are bit-identical (the spec contract); color can
    # differ by float fusion across shapes, so compare with 1-ulp slack.
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(depth_q))
    np.testing.assert_allclose(sf.color_np(), np.moveaxis(np.asarray(color), 0, -1), atol=2e-7)


def test_geometry_parallel_matches():
    cfg = brt.RendererConfig(width=W, height=H)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    u = uniforms(0.8)
    sf = r.render_frame(pipe, mesh, u)

    tr = TiledRenderer(cfg, mesh_2d(2, 2, extra=2), geometry_axis="g")
    color, depth_q, tri_id = tr.render(pipe, mesh, u)
    np.testing.assert_array_equal(np.asarray(sf.tri_id), np.asarray(tri_id))
    np.testing.assert_array_equal(np.asarray(sf.depth_q), np.asarray(depth_q))
    np.testing.assert_allclose(sf.color_np(), np.moveaxis(np.asarray(color), 0, -1), atol=2e-7)


def test_tiled_output_is_sharded():
    cfg = brt.RendererConfig(width=W, height=H)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    tr = TiledRenderer(cfg, mesh_2d(2, 4))
    out, _, _ = tr.render(pipe, mesh, uniforms(0.1))
    # The image lives sharded across the device mesh — no implicit gather.
    assert len(out.sharding.device_set) == 8


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
    import dataclasses

    cfg = brt.RendererConfig(width=W, height=H, clear_depth=clear)
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
    import dataclasses

    cfg = brt.RendererConfig(width=W, height=H)
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    pipe = dataclasses.replace(
        pipe, depth=dataclasses.replace(pipe.depth, compare="not_equal")
    )
    tr = TiledRenderer(cfg, mesh_2d(2, 2, extra=2), geometry_axis="g")
    with pytest.raises(ValueError, match="not_equal"):
        tr.render(pipe, mesh, uniforms(0.8))
