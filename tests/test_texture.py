"""Texture sampler tests (fast flat-gather paths vs reference math)."""

import numpy as np
import jax.numpy as jnp
import pytest

from based_renderer_tpu.ops import texture as tex_ops
from based_renderer_tpu.ops import texture
from based_renderer_tpu.models import geometry


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


# ---------------------------------------------------------------------------
# scene.Texture (packed patches + mip chain)
# ---------------------------------------------------------------------------


def _uv_grid(h, w, scale=1.0):
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([(u + 0.5) / w * scale, (v + 0.5) / h * scale], axis=-1)


@pytest.mark.parametrize("wrap", ["repeat", "clamp"])
def test_packed_sampler_matches_raw_bilinear(wrap):
    from based_renderer_tpu.scene import upload_texture

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(16, 32, 3)).astype(np.float32)
    tex = upload_texture(img, wrap=wrap)
    uv = jnp.asarray(rng.uniform(-0.3, 1.3, size=(24, 24, 2)).astype(np.float32))
    a = np.asarray(texture.sample_bilinear(jnp.asarray(img), uv, wrap=wrap))
    b = np.asarray(texture.sample_texture(tex, uv))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_mip_chain_shapes_and_means():
    from based_renderer_tpu.scene import upload_texture

    img = geometry.checkerboard_texture(64)
    tex = upload_texture(img, mipmaps=True)
    assert tex.num_levels == 7  # 64 -> 1
    # Every level preserves the mean (box filter).
    wrap, c, sizes = tex.meta[:3]
    assert sizes[0] == (64, 64) and sizes[-1] == (1, 1)


def test_trilinear_lod_blends_to_average():
    from based_renderer_tpu.scene import upload_texture

    img = geometry.checkerboard_texture(64)
    tex = upload_texture(img, mipmaps=True)
    uv = jnp.asarray(_uv_grid(32, 32))
    s0 = np.asarray(texture.sample_trilinear(tex, uv, jnp.zeros((32, 32), jnp.float32)))
    b0 = np.asarray(texture.sample_bilinear(jnp.asarray(img), uv))
    np.testing.assert_allclose(s0, b0, atol=1e-6)  # lod 0 == bilinear
    stop = np.asarray(
        texture.sample_trilinear(tex, uv, jnp.full((32, 32), 6.0, jnp.float32))
    )
    np.testing.assert_allclose(
        stop, np.broadcast_to(img.reshape(-1, 3).mean(0), stop.shape), rtol=0, atol=3e-4
    )


def test_mipmaps_reduce_minification_aliasing():
    """Sampling a checkerboard at 8x minification: trilinear-with-derived-
    LOD output variance collapses toward the mean, bilinear's does not."""
    from based_renderer_tpu.scene import upload_texture

    img = geometry.checkerboard_texture(256)
    tex = upload_texture(img, mipmaps=True)
    uv_np = _uv_grid(64, 64, scale=19.37)  # ~19 repeats across 64 px => minified
    uv = jnp.asarray(uv_np)
    lod = texture.lod_from_uv(uv, 256, 256)
    tri = np.asarray(texture.sample_texture(tex, uv, lod))
    bil = np.asarray(texture.sample_bilinear(jnp.asarray(img), uv))
    assert float(np.asarray(lod).mean()) > 4.0  # genuinely minified
    assert tri[..., 0].std() < 0.25 * bil[..., 0].std()


def test_renderer_textured_cube_mipmapped():
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos

    cfg = brt.RendererConfig(width=96, height=64, raster_backend="pallas")
    r = brt.Renderer(cfg)
    pipe, mesh, uniforms, _ = demos.textured_cube_demo(r)
    f = r.render_frame(pipe, mesh, uniforms(0.5))
    c = f.color_np()
    assert np.isfinite(c).all() and (np.asarray(f.tri_id) >= 0).any()


def test_mip_filter_nearest_single_tap():
    """Opt-in nearest-mip sampler state: a high LOD taps the deepest
    level (the texture's mean), a ~0 LOD taps level 0.  (The default is
    "linear"/trilinear — the GPU-default quality tier.)"""
    import jax.numpy as jnp
    from based_renderer_tpu.ops import texture as tx
    from based_renderer_tpu.scene import upload_texture

    img = geometry.checkerboard_texture(64)
    assert upload_texture(img, mipmaps=True).mip_filter == "linear"  # default
    tex = upload_texture(img, mipmaps=True, mip_filter="nearest")
    assert tex.mip_filter == "nearest"
    uv = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (8, 8, 2)), jnp.float32)
    deep = np.asarray(tx.sample_texture(tex, uv, lod=jnp.full((8, 8), 10.0)))
    np.testing.assert_allclose(deep, np.asarray(img).mean((0, 1)) * np.ones_like(deep), atol=1e-3)
    near = np.asarray(tx.sample_texture(tex, uv, lod=jnp.zeros((8, 8))))
    direct = np.asarray(tx.sample_bilinear(jnp.asarray(np.asarray(img, np.float32)), uv))
    np.testing.assert_allclose(near, direct, atol=1e-5)


def test_mip_filter_linear_opt_in():
    import jax.numpy as jnp
    from based_renderer_tpu.ops import texture as tx
    from based_renderer_tpu.scene import upload_texture

    img = geometry.checkerboard_texture(32)
    tex = upload_texture(img, mipmaps=True, mip_filter="linear")
    assert tex.mip_filter == "linear"
    uv = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.9, (4, 4, 2)), jnp.float32)
    lo = np.asarray(tx.sample_texture(tex, uv, lod=jnp.zeros((4, 4))))
    hi = np.asarray(tx.sample_texture(tex, uv, lod=jnp.full((4, 4), 10.0)))
    mid = np.asarray(tx.sample_texture(tex, uv, lod=jnp.full((4, 4), 0.5)))
    np.testing.assert_allclose(mid, 0.5 * lo + 0.5 * hi_level1(tex, uv), atol=1e-5)


def hi_level1(tex, uv):
    import jax.numpy as jnp
    from based_renderer_tpu.ops import texture as tx

    return np.asarray(
        tx._sample_packed_level(tex, uv, jnp.ones(uv.shape[:-1], jnp.int32))
    )


def test_anisotropic_degenerate_single_tap():
    """max_aniso=1 equals the nearest-mip tap at the minor-axis LOD for an
    isotropic footprint."""
    from based_renderer_tpu.scene import upload_texture
    from based_renderer_tpu.ops import texture as tx

    img = geometry.checkerboard_texture(64)
    tex = upload_texture(img, mipmaps=True)
    uv = jnp.asarray(_uv_grid(32, 32))  # isotropic 2x minification
    a1 = np.asarray(tx.sample_anisotropic(tex, uv, max_aniso=1))
    lod = tx.lod_from_uv(uv, 64, 64)
    ref = np.asarray(tx.sample_texture(tex, uv, lod))
    # Same level selection up to the lod formula's metric (max-abs vs L2):
    # compare against a direct level tap at the rounded L2 lod.
    lvl = jnp.clip(jnp.round(jnp.log2(jnp.maximum(64.0 / 32.0, 1e-12))).astype(jnp.int32), 0, 6)
    direct = np.asarray(tx._sample_packed_level(tex, uv, jnp.full(uv.shape[:-1], lvl)))
    np.testing.assert_allclose(a1, direct, atol=1e-6)
    assert ref.shape == a1.shape


def test_anisotropic_reduces_streak_aliasing():
    """A footprint stretched 8x in u only: anisotropic taps keep the
    v detail (std between plain-mip and full-res) while plain mip at the
    major-axis LOD over-blurs.  Sanity: output finite and bounded."""
    from based_renderer_tpu.scene import upload_texture
    from based_renderer_tpu.ops import texture as tx

    img = geometry.checkerboard_texture(256)
    tex = upload_texture(img, mipmaps=True)
    v, u = np.mgrid[0:64, 0:64].astype(np.float32)
    uv_np = np.stack([(u + 0.5) / 64 * 8.0, (v + 0.5) / 64 * 0.9], axis=-1)
    uv = jnp.asarray(uv_np)
    aniso = np.asarray(tx.sample_anisotropic(tex, uv, max_aniso=8))
    lod = tx.lod_from_uv(uv, 256, 256)
    mip = np.asarray(tx.sample_texture(tex, uv, lod))
    assert np.isfinite(aniso).all()
    # The anisotropic result preserves more contrast than the isotropic
    # mip tap (which must blur to the major axis) while staying less
    # aliased than full-res bilinear.
    bil = np.asarray(tx.sample_bilinear(jnp.asarray(np.asarray(img, np.float32)), uv))
    assert aniso[..., 0].std() >= mip[..., 0].std() * 0.9
    assert aniso[..., 0].std() <= bil[..., 0].std()


def test_renderer_upload_texture_exposes_sampler_state():
    """Renderer.upload_texture passes wrap/mipmaps/mip_filter through
    (the trilinear opt-in used to be unreachable from the renderer
    surface)."""
    import based_renderer_tpu as brt

    r = brt.Renderer(brt.RendererConfig(width=32, height=32))
    img = geometry.checkerboard_texture()
    t = r.upload_texture(img, wrap="clamp", mipmaps=True, mip_filter="linear")
    assert t.wrap == "clamp"
    assert t.mip_filter == "linear"
    assert t.num_levels > 1


# ---------------------------------------------------------------------------
# Separable MXU resampler (sample_separable)
# ---------------------------------------------------------------------------


def _broadcast_uv(u_row, v_col):
    """Exactly-separable (H, W, 2) uv field from its axis profiles."""
    H, W = v_col.shape[0], u_row.shape[0]
    return jnp.stack(
        [jnp.broadcast_to(u_row[None, :], (H, W)), jnp.broadcast_to(v_col[:, None], (H, W))],
        axis=-1,
    )


@pytest.mark.parametrize("wrap", ["repeat", "clamp"])
@pytest.mark.parametrize("mip_filter", ["nearest", "linear"])
def test_separable_matches_gather_to_ulp(wrap, mip_filter):
    """On an exactly-separable uv field with a constant LOD, the one-hot
    matmul resampler matches the flat-gather sampler to <= 2 ulp: the
    texel FETCH is exact (one-hot matmul), and the lerp expressions are
    the same arithmetic — but XLA may contract the mul-add chains to FMA
    differently in the two programs (the per-program contraction hazard
    CLAUDE.md documents), so the last bit is not pinned."""
    from based_renderer_tpu.scene import upload_texture

    rng = np.random.default_rng(7)
    tex = upload_texture(
        rng.random((16, 32, 4)).astype(np.float32),
        wrap=wrap,
        mipmaps=True,
        mip_filter=mip_filter,
    )
    u_row = jnp.asarray(rng.uniform(-0.4, 1.7, (40,)).astype(np.float32))
    v_col = jnp.asarray(rng.uniform(-0.4, 1.7, (24,)).astype(np.float32))
    uv = _broadcast_uv(u_row, v_col)
    for lod in (-1.0, 0.0, 0.7, 1.49, 2.51, 9.0):
        lod_t = jnp.float32(lod)
        got = np.asarray(tex_ops.sample_separable(tex, u_row, v_col, lod_t))
        if mip_filter == "linear":
            want = np.asarray(
                tex_ops.sample_trilinear(tex, uv, jnp.full(uv.shape[:-1], lod_t))
            )
        else:
            lvl = jnp.clip(
                jnp.round(jnp.full(uv.shape[:-1], lod_t)).astype(jnp.int32),
                0,
                tex.num_levels - 1,
            )
            want = np.asarray(tex_ops._sample_packed_level(tex, uv, lvl))
        np.testing.assert_allclose(got, want, atol=3e-7, err_msg=f"lod={lod}")


def test_separable_fetch_exact_at_texel_centers():
    """At texel centers the blend weights are 0, so the sample IS the
    one-hot-fetched texel — exactness of the MXU fetch with no lerp in
    the way."""
    from based_renderer_tpu.scene import upload_texture

    rng = np.random.default_rng(9)
    base = rng.random((8, 16, 4)).astype(np.float32)
    tex = upload_texture(base, mipmaps=False)
    u_row = jnp.asarray((np.arange(16) + 0.5) / 16.0, jnp.float32)
    v_col = jnp.asarray((np.arange(8) + 0.5) / 8.0, jnp.float32)
    got = np.asarray(tex_ops.sample_separable(tex, u_row, v_col))
    np.testing.assert_array_equal(got, base)


def test_separable_single_level():
    from based_renderer_tpu.scene import upload_texture

    rng = np.random.default_rng(8)
    tex = upload_texture(rng.random((8, 8, 3)).astype(np.float32), mipmaps=False)
    u_row = jnp.linspace(0.0, 1.0, 17, dtype=jnp.float32)
    v_col = jnp.linspace(0.1, 0.9, 9, dtype=jnp.float32)
    got = np.asarray(tex_ops.sample_separable(tex, u_row, v_col))
    want = np.asarray(tex_ops.sample_texture(tex, _broadcast_uv(u_row, v_col)))
    np.testing.assert_array_equal(got, want)


def test_fullscreen_shader_separable_matches_gather():
    """The textured_fullscreen shader's separable fast path matches the
    per-pixel gather variant to interpolation-noise tolerance (the uv
    planes carry ulp-level cross-axis terms), with identical coverage.

    The LAST row/column are excluded from the tight comparison: the
    gather path's lod_from_uv bends there (clamped forward differences
    zero one derivative), while the separable path uses the analytic
    constant LOD of the affine mapping — the documented semantic
    difference.  Everything else must agree."""
    import based_renderer_tpu as brt
    from based_renderer_tpu.models import demos
    import dataclasses

    r = brt.Renderer(brt.RendererConfig(width=128, height=96))
    pipe, mesh, uniforms, _ = demos.textured_fullscreen_demo(r)
    f_sep = r.render_frame(pipe, mesh, uniforms(0.4))
    pipe_g = dataclasses.replace(pipe, shader="textured_fullscreen_gather")
    f_gat = r.render_frame(pipe_g, mesh, uniforms(0.4))
    np.testing.assert_array_equal(np.asarray(f_sep.tri_id), np.asarray(f_gat.tri_id))
    cs = np.asarray(f_sep.color_planar)
    cg = np.asarray(f_gat.color_planar)
    np.testing.assert_allclose(cs[:, :-1, :-1], cg[:, :-1, :-1], atol=2e-4)
    # The whole frame (edges included) stays within one mip level's worth
    # of difference.
    assert np.abs(cs - cg).max() < 0.5
