"""Pallas binner assembly (ops/binassem.py) parity with the XLA assembly.

The contract: integer records (coverage/depth spec) are bit-identical on
every live slot; float records may differ by 1 ulp on the re-anchored
plane bases only (the two compilations may contract the multiply-adds
differently), so gradients are compared exactly and bases to tight
tolerance.  End-to-end, coverage and quantized depth stay bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from based_renderer_tpu.ops.binning import bin_triangles
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
from based_renderer_tpu.ops.setup import setup_triangles


def _random_setup(seed=0, tris=73, w=256, h=192):
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (tris, 3, 4)).astype(jnp.float32)
    clip = v.at[:, :, 3].set(jnp.abs(v[:, :, 3]) + 1.0)
    return setup_triangles(clip, w, h), w, h


@pytest.mark.parametrize("msaa4", [False, True])
@pytest.mark.parametrize("max_pairs", [None, 2048])
def test_assembly_matches_xla(msaa4, max_pairs):
    ts, w, h = _random_setup()
    ch = jax.random.normal(jax.random.PRNGKey(1), (73, 3, 2)).astype(jnp.float32)
    a = bin_triangles(ts, w, h, 128, 8, max_pairs, channels=ch, msaa4=msaa4)
    b = bin_triangles(
        ts, w, h, 128, 8, max_pairs, channels=ch, msaa4=msaa4,
        assemble="pallas", interpret=True,
    )
    n = min(int(a.num_pairs), a.records.shape[1] - 128, b.records.shape[1] - 128)
    assert n > 64
    ra, rb = np.asarray(a.records), np.asarray(b.records)
    np.testing.assert_array_equal(ra[:, :n], rb[:, :n])
    fa, fb = np.asarray(a.frecords), np.asarray(b.frecords)
    # Gradient rows (pdx, pdy) and the ftid row are copied, not recomputed:
    # exact.  Base rows (the p00 re-anchor multiply-add) may differ by a few
    # ulp of the LARGEST term (the two compilations contract differently and
    # the re-anchor cancels), far inside the u8-color rendering contract.
    for p in range(3 + 2):
        np.testing.assert_array_equal(fa[3 * p + 1, :n], fb[3 * p + 1, :n])
        np.testing.assert_array_equal(fa[3 * p + 2, :n], fb[3 * p + 2, :n])
        np.testing.assert_allclose(fa[3 * p, :n], fb[3 * p, :n], rtol=1e-6, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(a.tile_start), np.asarray(b.tile_start))
    np.testing.assert_array_equal(np.asarray(a.tile_count), np.asarray(b.tile_count))
    assert bool(a.overflowed) == bool(b.overflowed)
    assert int(a.num_pairs) == int(b.num_pairs)


@pytest.mark.parametrize("sublane", [False, True])
def test_end_to_end_coverage_depth_bitexact(sublane):
    ts, w, h = _random_setup(seed=3, tris=57)
    ch = jax.random.normal(jax.random.PRNGKey(2), (57, 3, 3)).astype(jnp.float32)
    kw = dict(
        tile_w=128, tile_h=8, interpret=True, channels=ch, sublane=sublane
    )
    va, ia, wa = rasterize_vis_pallas(ts, w, h, assemble="xla", **kw)
    vb, ib, wb = rasterize_vis_pallas(ts, w, h, assemble="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(va.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(va.depth_q), np.asarray(vb.depth_q))
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib), rtol=0, atol=1e-4)


def test_renderer_pipeline_knob():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    r = brt.Renderer(brt.RendererConfig(width=128, height=64, raster_backend="pallas"))
    pipe, mesh, uniforms, _ = demos.cube_demo(r)
    fa = r.render_frame(pipe, mesh, uniforms(0.3))
    import dataclasses

    pipe_p = dataclasses.replace(pipe, raster_assemble="pallas")
    fb = r.render_frame(pipe_p, mesh, uniforms(0.3))
    np.testing.assert_array_equal(np.asarray(fa.tri_id), np.asarray(fb.tri_id))
    np.testing.assert_array_equal(np.asarray(fa.depth_q), np.asarray(fb.depth_q))
    # u8 color should survive the <=1 ulp plane-base drift on this scene.
    np.testing.assert_array_equal(fa.color_u8(), fb.color_u8())
