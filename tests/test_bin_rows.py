"""Sub-tile band binning (Pipeline.raster_bin_rows) bit-identity.

Band binning re-bins records at (tile_w x band_rows) granularity with
column-major bin ids (ops/binning.py col_major_ids) so the sublane kernel
evaluates each record over only its band's rows.  Bands partition pixel
rows, so coverage / quantized depth / tri_id / interpolants must be
BIT-identical to the unbanded stream — these tests enforce that, plus the
budget-overflow surfacing (band-crossing triangles bin once per band, so
tight budgets overflow sooner).

Reference workload: the big-mesh tier of /root/reference/src/main.cpp:2103
(1M-triangle scenes), where pass-1 row work dominates the raster kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas


def _random_scene(T, seed=3, W=256, H=96, K=0):
    kv, kz, kc = jax.random.split(jax.random.PRNGKey(seed), 3)
    v = jax.random.uniform(kv, (T, 3, 2), jnp.float32) * 2.2 - 1.1
    z = jax.random.uniform(kz, (T, 3, 1), jnp.float32) * 0.9 + 0.05
    w = jnp.ones((T, 3, 1), jnp.float32)
    clip = jnp.concatenate([v, z, w], axis=-1)
    ch = (
        jax.random.normal(kc, (T, 3, K), jnp.float32) if K else None
    )
    return setup_triangles(clip, W, H), ch


def _assert_bits_equal(a, b, name):
    aa, bb = np.asarray(a), np.asarray(b)
    if aa.dtype == np.float32:
        same = (aa.view(np.int32) == bb.view(np.int32)).all()
    else:
        same = (aa == bb).all()
    assert same, f"{name} differs: {np.argwhere(np.asarray(aa != bb))[:5]}"


@pytest.mark.parametrize("bin_rows", [1, 2, 4, 8])
@pytest.mark.parametrize("depth_clip", [True, False])
def test_band_binning_bit_identical(bin_rows, depth_clip):
    W, H = 256, 96
    ts, ch = _random_scene(240, W=W, H=H, K=4)
    kw = dict(
        tile_w=128,
        tile_h=8,
        sublane=True,
        sublane_group=16,
        channels=ch,
        depth_clip=depth_clip,
        max_pairs=240 * 128,
        slots=240 * 128,
        interpret=True,
    )
    base_vis, base_interp, base_invw = rasterize_vis_pallas(ts, W, H, **kw)
    vis, interp, invw = rasterize_vis_pallas(ts, W, H, bin_rows=bin_rows, **kw)
    _assert_bits_equal(base_vis.tri_id, vis.tri_id, "tri_id")
    _assert_bits_equal(base_vis.depth_q, vis.depth_q, "depth_q")
    _assert_bits_equal(base_vis.b0, vis.b0, "b0")
    _assert_bits_equal(base_vis.b1, vis.b1, "b1")
    _assert_bits_equal(base_vis.b2, vis.b2, "b2")
    _assert_bits_equal(base_interp, interp, "interp")
    _assert_bits_equal(base_invw, invw, "invw")


def test_band_binning_overflow_surfaces():
    # Each triangle spans ~its pixel-row count of bins at bin_rows=1, so a
    # budget sized for whole-tile binning must overflow and say so.
    W, H = 256, 96
    ts, _ = _random_scene(4, W=W, H=H)
    kw = dict(
        tile_w=128, tile_h=8, sublane=True, sublane_group=16, interpret=True
    )
    _, of = rasterize_vis_pallas(
        ts, W, H, max_pairs=256, slots=256, return_overflow=True, **kw
    )
    assert not bool(of)
    _, of1 = rasterize_vis_pallas(
        ts, W, H, bin_rows=1, max_pairs=256, slots=256,
        return_overflow=True, **kw
    )
    assert bool(of1)
    _, of2 = rasterize_vis_pallas(
        ts, W, H, bin_rows=1, max_pairs=2048, slots=2048,
        return_overflow=True, **kw
    )
    assert not bool(of2)


def test_band_binning_requires_sublane():
    W, H = 256, 96
    ts, _ = _random_scene(8, W=W, H=H)
    with pytest.raises(ValueError, match="sublane"):
        rasterize_vis_pallas(
            ts, W, H, tile_w=128, tile_h=8, bin_rows=4, interpret=True
        )


def test_band_binning_multidraw_init():
    # Banded draws must compose with an init buffer (multi-draw frames).
    W, H = 256, 96
    ts1, _ = _random_scene(60, seed=11, W=W, H=H)
    ts2, _ = _random_scene(60, seed=12, W=W, H=H)
    kw = dict(
        tile_w=128,
        tile_h=8,
        sublane=True,
        sublane_group=16,
        max_pairs=60 * 128,
        slots=60 * 128,
        interpret=True,
    )
    base1 = rasterize_vis_pallas(ts1, W, H, **kw)
    base2 = rasterize_vis_pallas(ts2, W, H, init=base1, id_offset=60, **kw)
    b1 = rasterize_vis_pallas(ts1, W, H, bin_rows=2, **kw)
    b2 = rasterize_vis_pallas(
        ts2, W, H, bin_rows=2, init=b1, id_offset=60, **kw
    )
    _assert_bits_equal(base2.tri_id, b2.tri_id, "tri_id")
    _assert_bits_equal(base2.depth_q, b2.depth_q, "depth_q")
