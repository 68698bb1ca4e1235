"""Adversarial bit-identity tests: regimes the random fuzz never reaches.

Round-1 review found a confirmed oracle/device divergence on steep
slivers whose quantized depth gradient saturates DEPTH_GRAD_CLAMP (the
oracle used (1<<22)-1 while ops/fixedpoint.py proves and uses (1<<21)-1).
This suite pins the clamp-engaged regime — plus near-degenerate areas,
guard-band-edge coordinates, and both zshift extremes — bitwise across
oracle <-> XLA <-> Pallas(interpret).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from based_renderer_tpu.ops import fixedpoint as fp
from based_renderer_tpu.ops.raster_pallas import rasterize_vis_pallas
from based_renderer_tpu.ops.raster_xla import rasterize_vis
from based_renderer_tpu.ops.setup import setup_triangles
from based_renderer_tpu.reference import oracle

W, H = 96, 64


def screen_to_clip(sx, sy, z, w=None):
    """Screen-space (pixels) + depth -> clip positions with w=1.

    The oracle/device front-end maps ndc -> screen as
    (ndc*0.5 + 0.5) * extent, so ndc = 2*s/extent - 1 round-trips it
    (not exactly, but both paths share the float front-end, so any
    rounding is common-mode)."""
    sx = np.asarray(sx, np.float32)
    sy = np.asarray(sy, np.float32)
    z = np.asarray(z, np.float32)
    nx = sx / np.float32(W) * 2 - 1
    ny = sy / np.float32(H) * 2 - 1
    ones = np.ones_like(nx)
    return np.stack([nx, ny, z, ones], axis=-1).astype(np.float32)


def assert_all_paths_identical(clip, depth_compare="less"):
    ts = setup_triangles(jnp.asarray(clip), W, H)
    vx = rasterize_vis(ts, W, H, depth_compare=depth_compare)
    vp = rasterize_vis_pallas(ts, W, H, depth_compare=depth_compare, interpret=True)
    vl = rasterize_vis_pallas(
        ts, W, H, depth_compare=depth_compare, interpret=True,
        tile_w=128, tile_h=8, sublane=True,
    )
    ora = oracle.rasterize(clip, W, H, depth_compare=depth_compare)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vx.depth_q), ora["depth_q"])
    np.testing.assert_array_equal(np.asarray(vp.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vp.depth_q), ora["depth_q"])
    np.testing.assert_array_equal(np.asarray(vl.tri_id), ora["tri_id"])
    np.testing.assert_array_equal(np.asarray(vl.depth_q), ora["depth_q"])
    return ora


def steep_slivers(rng, n):
    """Nearly-degenerate triangles spanning the full depth range over a
    subpixel-scale screen extent — the depth-gradient-clamp regime."""
    # Base pixel somewhere on screen (keep inside so coverage is possible).
    bx = rng.uniform(2.0, W - 2.0, size=n).astype(np.float32)
    by = rng.uniform(2.0, H - 2.0, size=n).astype(np.float32)
    # Sliver extent: a fraction of a pixel up to ~2 pixels, in a random
    # orientation; the third vertex is offset by ~a subpixel off-axis.
    length = rng.uniform(0.05, 2.0, size=n).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    off = rng.uniform(1.0 / 32, 4.0 / 16, size=n).astype(np.float32)
    dx, dy = np.cos(theta) * length, np.sin(theta) * length
    sx = np.stack([bx, bx + dx, bx + dx * 0.5 - dy / length * off], -1)
    sy = np.stack([by, by + dy, by + dy * 0.5 + dx / length * off], -1)
    # Full-range depth across the sliver => gradient saturates the clamp.
    z0 = rng.uniform(0.0, 0.2, size=n).astype(np.float32)
    z1 = rng.uniform(0.8, 1.0, size=n).astype(np.float32)
    zm = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
    z = np.stack([z0, z1, zm], -1)
    return screen_to_clip(sx, sy, z)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_steep_sliver_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    clip = steep_slivers(rng, 220)
    ora = assert_all_paths_identical(clip)
    if seed == 0:
        assert (ora["tri_id"] >= 0).any(), "fuzz produced zero coverage"


def test_grad_clamp_divergence_class():
    """Half-pixel-tall, wide sliver whose quantized y depth gradient lands
    exactly on the DEPTH_GRAD_CLAMP rint boundary — the regime of the
    round-1 oracle/device divergence (oracle used (1<<22)-1).

    Construction (all steps exact in f32 by powers-of-two choices):
      v0 = (4, 71) fp, v1 = (1028, 71), v2 = (4, 79); area2 = 2^13,
      zq2 - zq0 = 2^27 - 8 => gy16 = 2^28 - 16, zshift = 13, and the
      quantized gradient rint((2^28-16) * 2^-7) = 2^21 clamps to 2^21-1.
      With this geometry, oracle-with-(1<<22)-1 differs from the device
      paths by 32768 depth LSB over 56 covered pixels (verified when the
      bug was fixed), so this test detects any clamp-constant drift.
    """
    k = -35000
    sx = np.array([[4, 1028, 4]], np.float32) / 16.0
    sy = np.array([[71, 71, 79]], np.float32) / 16.0
    z0 = np.float32(128 * k) * np.float32(2.0**-24)
    z2 = np.float32(128 * k + 2**27 - 8) * np.float32(2.0**-24)
    z = np.array([[z0, z0, z2]], np.float32)
    clip = screen_to_clip(sx, sy, z)
    ts = setup_triangles(jnp.asarray(clip), W, H)
    # The whole point: the gradient must actually clamp.
    assert int(np.abs(np.asarray(ts.dzdy_q)).max()) == fp.DEPTH_GRAD_CLAMP, (
        "construction no longer engages DEPTH_GRAD_CLAMP"
    )
    ora = assert_all_paths_identical(clip)
    assert (ora["tri_id"] >= 0).sum() > 40, "lost coverage; test is vacuous"


def test_grad_clamp_constants_agree():
    assert oracle.DEPTH_GRAD_CLAMP == fp.DEPTH_GRAD_CLAMP
    # The value-exactness proof bound (ops/fixedpoint.py): in-tile depth
    # variation must stay below 2^29.
    assert 2 * fp.DEPTH_GRAD_CLAMP * 127 < 1 << 29


def test_guard_band_edges():
    """Vertices at and beyond the +/-8192 px guard band (snapped coords
    clamp to the band edge identically on all paths)."""
    g = float(fp.GUARD_BAND_PIX)
    sx = np.array(
        [
            [-g, W + 40.0, 30.0],
            [-g * 2, g * 2, 40.0],  # beyond the band: clamped
            [W / 2, g, -g],
        ],
        np.float32,
    )
    sy = np.array(
        [
            [-g, -10.0, H + 30.0],
            [H / 3, H / 2, g * 2],
            [-g, H / 2, H / 2],
        ],
        np.float32,
    )
    z = np.array(
        [[0.1, 0.9, 0.5], [0.0, 1.0, 0.5], [0.3, 0.7, 0.2]], np.float32
    )
    clip = screen_to_clip(sx, sy, z)
    assert_all_paths_identical(clip)


@pytest.mark.parametrize("mode", ["flat", "steep"])
def test_zshift_extremes(mode):
    """zshift == 0 (flat planes) and near-max zshift (steepest planes).

    The spec clamps zshift at 24 defensively, but the reachable maximum
    is ~20: snapped extent >= 1 fp unit and |zq| <= 2^29 bound the
    gradient at 2^30 LSB/fp-unit => slope <= 2^34 => zshift <= 20."""
    rng = np.random.default_rng(7 if mode == "flat" else 8)
    n = 64
    bx = rng.uniform(2, W - 20, size=n).astype(np.float32)
    by = rng.uniform(2, H - 20, size=n).astype(np.float32)
    if mode == "flat":
        # Constant-z triangles of ordinary size: slope ~ 0 => zshift 0.
        sx = np.stack([bx, bx + 15, bx + 4], -1)
        sy = np.stack([by, by + 3, by + 12], -1)
        zc = rng.uniform(0, 1, size=n).astype(np.float32)
        z = np.stack([zc, zc, zc], -1)
    else:
        # Micro-triangles (2 fp-unit extent) spanning the full +/-2^29
        # quantized-depth window: the steepest representable planes.
        bx = np.rint(bx * 16) / np.float32(16)  # land on the snap grid
        by = np.rint(by * 16) / np.float32(16)
        sx = np.stack([bx, bx + 2.0 / 16, bx], -1)
        sy = np.stack([by, by, by + 2.0 / 16], -1)
        z = np.tile(np.float32([-32.0, 32.0, 32.0]), (n, 1))
    clip = screen_to_clip(sx, sy, z)
    ts = setup_triangles(jnp.asarray(clip), W, H)
    zs = np.asarray(ts.zshift)[np.asarray(ts.valid)]
    if mode == "flat":
        assert (zs == 0).any()
    else:
        assert zs.max() >= 18
    assert_all_paths_identical(clip)
