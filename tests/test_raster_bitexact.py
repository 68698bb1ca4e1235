"""Bit-identity: pure-XLA rasterizer vs the CPU numpy oracle.

Coverage (winning tri_id per pixel) and depth must match *exactly* —
this is the test pyramid layer the reference entirely lacks (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.ops.raster_xla import rasterize_vis
from based_renderer_tpu.reference import oracle


def random_clip_triangles(rng, n, spread=1.2, z_range=(0.0, 1.0), w_range=(0.5, 3.0)):
    """Clip-space triangles, mostly on-screen, random w per vertex."""
    w = rng.uniform(*w_range, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-spread, spread, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(*z_range, size=(n, 3, 1)).astype(np.float32) * w
    return np.concatenate([xy, z, w], axis=-1).astype(np.float32)


def run_both(clip, width, height, **kw):
    ts = setup_triangles(jnp.asarray(clip), width, height,
                         cull_mode=kw.get("cull_mode", "none"),
                         front_face=kw.get("front_face", "ccw"))
    vis = jax.jit(
        lambda ts: rasterize_vis(
            ts, width, height,
            depth_test=kw.get("depth_test", True),
            depth_compare=kw.get("depth_compare", "less"),
        )
    )(ts)
    ora = oracle.rasterize(
        clip, width, height,
        cull_mode=kw.get("cull_mode", "none"),
        front_face=kw.get("front_face", "ccw"),
        depth_test=kw.get("depth_test", True),
        depth_compare=kw.get("depth_compare", "less"),
    )
    return vis, ora


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_triangles_bit_identical(seed):
    rng = np.random.default_rng(seed)
    clip = random_clip_triangles(rng, 24)
    vis, ora = run_both(clip, 96, 64)
    np.testing.assert_array_equal(np.asarray(vis.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vis.depth_q), ora["depth_q"])


def test_degenerate_and_offscreen():
    clip = np.array(
        [
            # degenerate (zero area)
            [[0, 0, 0.5, 1], [0.5, 0.5, 0.5, 1], [1, 1, 0.5, 1]],
            # fully offscreen
            [[5, 5, 0.5, 1], [6, 5, 0.5, 1], [5, 6, 0.5, 1]],
            # behind camera (w < 0)
            [[0, 0, 0.5, -1], [0.5, 0, 0.5, -1], [0, 0.5, 0.5, -1]],
            # valid triangle
            [[-0.8, -0.8, 0.25, 1], [0.8, -0.6, 0.25, 1], [0.0, 0.9, 0.25, 1]],
        ],
        dtype=np.float32,
    )
    vis, ora = run_both(clip, 64, 64)
    np.testing.assert_array_equal(np.asarray(vis.tri_id), ora["tri_id"])
    assert (np.asarray(vis.tri_id) == 3).any()
    assert not (np.asarray(vis.tri_id) == 0).any()
    assert not (np.asarray(vis.tri_id) == 1).any()
    assert not (np.asarray(vis.tri_id) == 2).any()


def test_shared_edge_no_double_no_gap():
    """Fill rule: two triangles sharing the diagonal of a quad must cover
    every interior pixel exactly once (top-left-style tie-break)."""
    # Quad corners in clip space (w=1), split along the diagonal.
    c = {
        "bl": [-0.7, -0.6, 0.5, 1.0],
        "br": [0.8, -0.7, 0.5, 1.0],
        "tr": [0.75, 0.66, 0.5, 1.0],
        "tl": [-0.66, 0.71, 0.5, 1.0],
    }
    tri_a = [c["bl"], c["br"], c["tr"]]
    tri_b = [c["bl"], c["tr"], c["tl"]]
    clip = np.array([tri_a, tri_b], dtype=np.float32)
    width = height = 80

    # Render each triangle alone (no depth test): coverage sets must be
    # disjoint and their union must equal the coverage of the quad.
    vis_a, _ = run_both(clip[:1], width, height, depth_test=False)
    vis_b, _ = run_both(clip[1:], width, height, depth_test=False)
    cov_a = np.asarray(vis_a.tri_id) >= 0
    cov_b = np.asarray(vis_b.tri_id) >= 0
    assert not (cov_a & cov_b).any(), "shared-edge pixels covered twice"

    vis_ab, ora = run_both(clip, width, height, depth_test=False)
    cov_union = np.asarray(vis_ab.tri_id) >= 0
    np.testing.assert_array_equal(cov_a | cov_b, cov_union)
    np.testing.assert_array_equal(np.asarray(vis_ab.tri_id), ora["tri_id"])


@pytest.mark.parametrize("compare", ["less", "less_equal", "greater", "always"])
def test_depth_compare_modes(compare):
    rng = np.random.default_rng(7)
    clip = random_clip_triangles(rng, 12)
    clear = 0.0 if compare == "greater" else 1.0
    width = height = 48
    ts = setup_triangles(jnp.asarray(clip), width, height)
    vis = rasterize_vis(ts, width, height, depth_compare=compare, depth_clear=clear)
    ora = oracle.rasterize(
        clip, width, height, depth_compare=compare, depth_clear=clear
    )
    np.testing.assert_array_equal(np.asarray(vis.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vis.depth_q), ora["depth_q"])


@pytest.mark.parametrize("cull,front", [("back", "ccw"), ("front", "ccw"), ("back", "cw")])
def test_culling(cull, front):
    rng = np.random.default_rng(11)
    clip = random_clip_triangles(rng, 16)
    vis, ora = run_both(clip, 48, 48, cull_mode=cull, front_face=front)
    np.testing.assert_array_equal(np.asarray(vis.tri_id), ora["tri_id"])


def test_empty_draw():
    """T=0 draws must not crash (trace-time index into a size-0 axis)."""
    ts = setup_triangles(jnp.zeros((0, 3, 4), jnp.float32), 32, 32)
    vis = rasterize_vis(ts, 32, 32)
    assert int((np.asarray(vis.tri_id) >= 0).sum()) == 0


def test_bary_close():
    """Barycentrics agree closely (not part of the bit-exact contract)."""
    rng = np.random.default_rng(3)
    clip = random_clip_triangles(rng, 8)
    vis, ora = run_both(clip, 64, 64)
    got = np.stack([np.asarray(vis.b0), np.asarray(vis.b1), np.asarray(vis.b2)], -1)
    mask = ora["tri_id"] >= 0
    np.testing.assert_allclose(got[mask], ora["bary"][mask], atol=1e-6)
