"""Per-instance frustum culling (ops/cull.py + Pipeline.instance_cull).

The contract is BIT-IDENTITY: culling may only remove instances that
could never have produced coverage, and survivors keep their original
draw-order triangle ids, so tri_id/depth_q match the unculled render
exactly (and color within the usual cross-program f32 tolerance — the
two programs may fuse the fragment math differently).
"""

import dataclasses
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos
from based_renderer_tpu.ops import cull
from based_renderer_tpu.scene import Mesh
from based_renderer_tpu.shader import get as get_shader


W, H = 192, 128


def _spread_instances(count, spread=30.0, seed=3):
    """A wide field of cubes, most of which fall outside a narrow view."""
    rng = np.random.default_rng(seed)
    t = np.zeros((count, 4, 4), np.float32)
    t[:, 0, 0] = t[:, 1, 1] = t[:, 2, 2] = 1.0
    t[:, 3, 3] = 1.0
    t[:, :3, 3] = rng.uniform(-spread, spread, (count, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 1.0, (count, 3)).astype(np.float32)
    return {
        "transform": jnp.asarray(t.reshape(count, 16)),
        "instance_color": jnp.asarray(colors),
    }


def _instanced_case(r, count=64, instance_cull=None):
    from based_renderer_tpu import math3d
    from based_renderer_tpu.pipeline import DepthState, Pipeline

    data = __import__(
        "based_renderer_tpu.models.geometry", fromlist=["geometry"]
    ).cube_mesh_data()
    mesh = r.upload_mesh(data["positions"])
    instances = _spread_instances(count)
    pipe = Pipeline(
        shader="instanced_color",
        depth=DepthState(test=True, write=True, compare="less"),
        cull_mode="back",
        front_face="ccw",
        near_clip=False,
        instance_cull=instance_cull,
    )
    aspect = r.config.width / r.config.height
    view = math3d.look_at((0.0, 0.0, -40.0), (0.0, 0.0, 0.0), (0.0, -1.0, 0.0))
    proj = math3d.perspective(np.radians(30.0), aspect, 0.1, 200.0)
    uniforms = {"view": view, "proj": proj}
    return pipe, mesh, uniforms, instances


def test_visibility_is_conservative_and_effective():
    r = brt.Renderer(brt.RendererConfig(width=W, height=H, raster_backend="pallas"))
    pipe, mesh, uniforms, instances = _instanced_case(r)
    shader = get_shader(pipe.shader)
    m = Mesh(attributes=mesh.attributes, indices=mesh.indices)
    vis = np.asarray(cull.instance_visibility(shader, m, instances, uniforms, W, H))
    # The narrow 30-deg view over a 60-unit field must cull a lot...
    assert vis.sum() < len(vis)
    # ...but never an instance that produced coverage: render unculled,
    # collect the instances that own visible pixels.
    f = r.render_frame(dataclasses.replace(pipe, instance_cull=None), mesh,
                       uniforms, instances=instances)
    tid = np.asarray(f.tri_id)
    covered = np.unique(tid[tid >= 0]) // m.num_triangles
    assert covered.size > 0  # scene is non-trivial
    assert vis[covered].all(), "a covering instance was culled"


def test_compaction_is_order_preserving():
    instances = _spread_instances(16)
    visible = jnp.asarray(
        [True, False, True, True, False, False, True, False] * 2
    )
    out, orig_idx, of = cull.compact_instances(instances, visible, budget=10)
    idx = np.asarray(orig_idx)
    nvis = int(np.asarray(visible).sum())
    vis_idx = np.nonzero(np.asarray(visible))[0]
    np.testing.assert_array_equal(idx[:nvis], vis_idx)  # stable order
    assert not bool(of)
    got = np.asarray(out["transform"])[:nvis]
    want = np.asarray(instances["transform"])[vis_idx]
    np.testing.assert_array_equal(got, want)
    # Too-small budget overflows.
    _, _, of2 = cull.compact_instances(instances, visible, budget=2)
    assert bool(of2)


@pytest.mark.parametrize("msaa", [1, 4])
def test_instance_cull_bit_identical(msaa):
    cfg = brt.RendererConfig(width=W, height=H, msaa=msaa, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, instances = _instanced_case(r, instance_cull=0.6)
    base = r.render_frame(
        dataclasses.replace(pipe, instance_cull=None),
        mesh, uniforms, instances=instances,
    )
    culled = r.render_frame(pipe, mesh, uniforms, instances=instances)
    assert not bool(np.asarray(culled.overflowed))
    np.testing.assert_array_equal(np.asarray(base.tri_id), np.asarray(culled.tri_id))
    np.testing.assert_array_equal(np.asarray(base.depth_q), np.asarray(culled.depth_q))
    np.testing.assert_allclose(base.color_np(), culled.color_np(), atol=1e-5)
    assert (np.asarray(base.tri_id) >= 0).any()


def test_instance_cull_budget_overflow_surfaces():
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    # Budget far below the visible count: overflow must be reported.
    pipe, mesh, uniforms, instances = _instanced_case(r, instance_cull=0.02)
    f = r.render_frame(pipe, mesh, uniforms, instances=instances)
    assert bool(np.asarray(f.overflowed))


def test_instance_cull_multidraw_ids_do_not_collide():
    """A culled instanced draw followed by another draw: the second
    draw's ids must sit above the FULL logical range of the first."""
    cfg = brt.RendererConfig(width=W, height=H, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, instances = _instanced_case(r, instance_cull=0.6)
    pipe2, mesh2, uniforms2, _ = demos.cube_demo(r)

    def frame(cull_frac):
        p1 = dataclasses.replace(pipe, instance_cull=cull_frac)
        r.begin_frame()
        r.draw(p1, mesh, uniforms, instances)
        r.draw(pipe2, mesh2, uniforms2(0.4))
        return r.end_frame()

    base, culled = frame(None), frame(0.6)
    np.testing.assert_array_equal(np.asarray(base.tri_id), np.asarray(culled.tri_id))
    np.testing.assert_array_equal(np.asarray(base.depth_q), np.asarray(culled.depth_q))
    np.testing.assert_allclose(base.color_np(), culled.color_np(), atol=1e-5)


def test_instance_cull_xla_backend_falls_back_with_warning():
    cfg = brt.RendererConfig(width=64, height=64, raster_backend="xla")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, instances = _instanced_case(r, count=8, instance_cull=0.5)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        f = r.render_frame(pipe, mesh, uniforms, instances=instances)
    assert any("instance_cull" in str(x.message) for x in w)
    base = r.render_frame(
        dataclasses.replace(pipe, instance_cull=None), mesh, uniforms,
        instances=instances,
    )
    np.testing.assert_array_equal(np.asarray(base.tri_id), np.asarray(f.tri_id))
