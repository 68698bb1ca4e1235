"""Pallas template-layout path (Pipeline.raster_tmpl) bit-identity.

The binner's row-major template matrix can be built either by the XLA
stack(axis=-1) (one lane-interleave pass per column) or field-major +
tiled Pallas transpose (ops/binassem.transpose_templates).  The transpose
is pure data movement over the same column expressions, so EVERY output —
records, frecords, tile tables — must be bit-identical, not just the
coverage/depth spec fields.

Reference workload: the big-mesh tier of /root/reference/src/main.cpp:2103
(1M-triangle scenes), where the template build is ~12.7 ms of the binner.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.ops.binning import bin_triangles
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas


def _random_scene(T, seed=3, W=256, H=96, K=0):
    kv, kz, kc = jax.random.split(jax.random.PRNGKey(seed), 3)
    v = jax.random.uniform(kv, (T, 3, 2), jnp.float32) * 2.2 - 1.1
    z = jax.random.uniform(kz, (T, 3, 1), jnp.float32) * 0.9 + 0.05
    w = jnp.ones((T, 3, 1), jnp.float32)
    clip = jnp.concatenate([v, z, w], axis=-1)
    ch = jax.random.normal(kc, (T, 3, K), jnp.float32) if K else None
    return setup_triangles(clip, W, H), ch


def _assert_bits_equal(a, b, name):
    aa, bb = np.asarray(a), np.asarray(b)
    if aa.dtype == np.float32:
        same = (aa.view(np.int32) == bb.view(np.int32)).all()
    else:
        same = (aa == bb).all()
    assert same, f"{name} differs"


@pytest.mark.parametrize("K", [0, 4])
@pytest.mark.parametrize("assemble", ["xla", "pallas"])
@pytest.mark.parametrize("msaa4", [False, True])
def test_tmpl_pallas_records_bit_identical(K, assemble, msaa4):
    W, H = 256, 96
    ts, ch = _random_scene(200, W=W, H=H, K=K)
    kw = dict(
        tile_w=128,
        tile_h=8,
        channels=ch,
        msaa4=msaa4,
        max_pairs=200 * 8,
        slots=200 * 4,
        assemble=assemble,
        interpret=True,
    )
    base = bin_triangles(ts, W, H, **kw)
    new = bin_triangles(ts, W, H, tmpl="pallas", **kw)
    _assert_bits_equal(base.records, new.records, "records")
    _assert_bits_equal(base.frecords, new.frecords, "frecords")
    _assert_bits_equal(base.tile_start, new.tile_start, "tile_start")
    _assert_bits_equal(base.tile_count, new.tile_count, "tile_count")
    _assert_bits_equal(base.num_pairs, new.num_pairs, "num_pairs")


@pytest.mark.parametrize("sublane", [False, True])
def test_tmpl_pallas_render_bit_identical(sublane):
    W, H = 256, 96
    ts, ch = _random_scene(240, seed=7, W=W, H=H, K=3)
    kw = dict(
        tile_w=128,
        tile_h=8,
        sublane=sublane,
        channels=ch,
        max_pairs=240 * 8,
        interpret=True,
    )
    base_vis, base_interp, base_invw = rasterize_vis_pallas(ts, W, H, **kw)
    vis, interp, invw = rasterize_vis_pallas(ts, W, H, tmpl="pallas", **kw)
    _assert_bits_equal(base_vis.tri_id, vis.tri_id, "tri_id")
    _assert_bits_equal(base_vis.depth_q, vis.depth_q, "depth_q")
    _assert_bits_equal(base_interp, interp, "interp")
    _assert_bits_equal(base_invw, invw, "invw")


def test_tmpl_pipeline_knob_validated():
    from based_renderer_tpu.pipeline import Pipeline

    with pytest.raises(ValueError, match="raster_tmpl"):
        Pipeline(shader="flat", raster_tmpl="nope")


def test_tmpl_pallas_end_to_end_frame():
    """Full Renderer frame with the knob on matches the default bitwise."""
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    r = brt.Renderer(brt.RendererConfig(width=192, height=96))
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    import dataclasses

    frame_a = r.render_frame(pipe, mesh, uniforms(0.3))
    pipe_b = dataclasses.replace(pipe, raster_tmpl="pallas")
    frame_b = r.render_frame(pipe_b, mesh, uniforms(0.3))
    _assert_bits_equal(frame_a.color, frame_b.color, "color")
