"""Texture sampler tests (fast flat-gather paths vs reference math)."""

import numpy as np
import jax.numpy as jnp
import pytest

from based_renderer_tpu.ops import texture as tex_ops


def reference_bilinear(tex, uv, wrap):
    th, tw, c = tex.shape
    out = np.zeros((*uv.shape[:-1], c), np.float32)
    def wr(v, size):
        if wrap == "repeat":
            return v % size
        return np.clip(v, 0, size - 1)
    it = np.ndindex(uv.shape[:-1])
    for idx in it:
        fx = uv[idx][0] * tw - 0.5
        fy = uv[idx][1] * th - 0.5
        x0, y0 = int(np.floor(fx)), int(np.floor(fy))
        ax, ay = fx - x0, fy - y0
        t00 = tex[wr(y0, th), wr(x0, tw)]
        t01 = tex[wr(y0, th), wr(x0 + 1, tw)]
        t10 = tex[wr(y0 + 1, th), wr(x0, tw)]
        t11 = tex[wr(y0 + 1, th), wr(x0 + 1, tw)]
        out[idx] = (t00 * (1 - ax) + t01 * ax) * (1 - ay) + (t10 * (1 - ax) + t11 * ax) * ay
    return out


@pytest.mark.parametrize("wrap", ["repeat", "clamp"])
def test_bilinear_matches_reference(wrap):
    rng = np.random.default_rng(0)
    tex = rng.random((8, 16, 3)).astype(np.float32)
    uv = rng.uniform(-0.3, 1.3, (6, 7, 2)).astype(np.float32)
    got = np.asarray(tex_ops.sample_bilinear(jnp.asarray(tex), jnp.asarray(uv), wrap=wrap))
    want = reference_bilinear(tex, uv, wrap)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_texel_centers():
    tex = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    # uv exactly at texel centers picks those texels.
    uv = np.array([[(x + 0.5) / 4, (y + 0.5) / 3] for y in range(3) for x in range(4)], np.float32)
    got = np.asarray(tex_ops.sample_nearest(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_array_equal(got[:, 0], np.arange(12))


def test_bilinear_at_centers_is_exact():
    rng = np.random.default_rng(1)
    tex = rng.random((4, 4, 2)).astype(np.float32)
    uv = np.array([[(x + 0.5) / 4, (y + 0.5) / 4] for y in range(4) for x in range(4)], np.float32)
    got = np.asarray(tex_ops.sample_bilinear(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_allclose(got, tex.reshape(16, 2), atol=1e-6)
