"""Blend-attachment-state parity tests.

The reference's VkPipelineColorBlendAttachmentState declares the full
factor enum, separate color/alpha factor+op pairs, and a colorWriteMask
(/root/reference/src/main.cpp:1806-1827).  These tests drive every family
through the renderer and check against an independent numpy mirror of the
Vulkan blend equations.
"""

import numpy as np
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import geometry
from based_renderer_tpu.pipeline import BlendState, DepthState, Pipeline

SMALL = brt.RendererConfig(width=64, height=48)
CLEAR = (0.25, 0.5, 0.75, 0.4)
SRC = (0.9, 0.3, 0.1, 0.6)


def blend_numpy(src, dst, state: BlendState):
    """Independent mirror of the Vulkan blend equations (channel-last)."""
    src = np.asarray(src, np.float32)
    dst = np.asarray(dst, np.float32)
    const = np.asarray(state.constants, np.float32)

    def factor(name, alpha):
        comp = (lambda x: x[3]) if alpha else (lambda x: x[:3])
        table = {
            "zero": np.float32(0.0),
            "one": np.float32(1.0),
            "src_color": comp(src),
            "one_minus_src_color": 1.0 - comp(src),
            "dst_color": comp(dst),
            "one_minus_dst_color": 1.0 - comp(dst),
            "src_alpha": src[3],
            "one_minus_src_alpha": 1.0 - src[3],
            "dst_alpha": dst[3],
            "one_minus_dst_alpha": 1.0 - dst[3],
            "constant_color": comp(const),
            "one_minus_constant_color": 1.0 - comp(const),
            "constant_alpha": const[3],
            "one_minus_constant_alpha": 1.0 - const[3],
            "src_alpha_saturate": np.float32(1.0)
            if alpha
            else np.minimum(src[3], 1.0 - dst[3]),
        }
        return table[name]

    def combine(op, sf, df, alpha):
        s = src[3] if alpha else src[:3]
        d = dst[3] if alpha else dst[:3]
        if op == "min":
            return np.minimum(s, d)
        if op == "max":
            return np.maximum(s, d)
        a, b = s * factor(sf, alpha), d * factor(df, alpha)
        return {"add": a + b, "subtract": a - b, "reverse_subtract": b - a}[op]

    if state.enable:
        rgb = combine(state.color_op, state.src_factor, state.dst_factor, False)
        a = combine(
            state.alpha_op or state.color_op,
            state.src_alpha_factor or state.src_factor,
            state.dst_alpha_factor or state.dst_factor,
            True,
        )
        out = np.concatenate([np.atleast_1d(rgb), np.atleast_1d(a)])
    else:
        out = src.copy()
    mask = np.array([ch in state.write_mask for ch in "rgba"])
    return np.where(mask, out, dst)


def render_blended(state: BlendState, backend="xla"):
    r = brt.Renderer(
        brt.RendererConfig(width=64, height=48, raster_backend=backend)
    )
    tri = geometry.triangle_mesh_data()
    mesh = r.upload_mesh(tri["positions"] * np.float32([[2.0, 2.0, 0.0]]))
    pipe = Pipeline(
        shader="flat_ndc", blend=state, depth=DepthState(test=False, write=False)
    )
    r.begin_frame(clear_color=CLEAR)
    r.draw(pipe, mesh, {"color": SRC})
    f = r.end_frame()
    return f.color_np(), np.asarray(f.tri_id) >= 0


STATES = [
    # Reference's shipped state: all factors zero, op add, full mask.
    BlendState(enable=True, src_factor="zero", dst_factor="zero"),
    # Classic alpha-over with separate alpha factors (premultiplied-style).
    BlendState(
        enable=True,
        src_factor="src_alpha",
        dst_factor="one_minus_src_alpha",
        src_alpha_factor="one",
        dst_alpha_factor="one_minus_src_alpha",
    ),
    # Color-valued factors.
    BlendState(enable=True, src_factor="dst_color", dst_factor="src_color"),
    BlendState(
        enable=True, src_factor="one_minus_dst_color", dst_factor="one_minus_src_color"
    ),
    # Ops.
    BlendState(enable=True, src_factor="one", dst_factor="one", color_op="subtract"),
    BlendState(
        enable=True, src_factor="one", dst_factor="one", color_op="reverse_subtract"
    ),
    BlendState(enable=True, color_op="min"),
    BlendState(enable=True, color_op="max", alpha_op="min"),
    # Constant-color family.
    BlendState(
        enable=True,
        src_factor="constant_color",
        dst_factor="one_minus_constant_alpha",
        constants=(0.2, 0.4, 0.6, 0.3),
    ),
    # src_alpha_saturate (color factor min(sa, 1-da); alpha factor 1).
    BlendState(enable=True, src_factor="src_alpha_saturate", dst_factor="one"),
    # Separate alpha op.
    BlendState(
        enable=True,
        src_factor="one",
        dst_factor="one",
        color_op="add",
        alpha_op="reverse_subtract",
    ),
    # Write masks, with and without blending.
    BlendState(enable=True, src_factor="src_alpha", dst_factor="one_minus_src_alpha",
               write_mask="rg"),
    BlendState(enable=False, write_mask="b"),
    BlendState(enable=False, write_mask=""),
]


@pytest.mark.parametrize("state", STATES, ids=range(len(STATES)))
def test_blend_matches_numpy_mirror(state):
    img, covered = render_blended(state)
    expected = blend_numpy(SRC, CLEAR, state)
    np.testing.assert_allclose(img[covered], np.broadcast_to(expected, img[covered].shape), atol=1e-6)
    # Uncovered pixels keep the clear color regardless of blend state.
    np.testing.assert_allclose(img[~covered], np.broadcast_to(np.float32(CLEAR), img[~covered].shape), atol=1e-6)


def test_blend_matches_on_pallas_interpret():
    state = BlendState(
        enable=True,
        src_factor="constant_color",
        dst_factor="dst_alpha",
        color_op="reverse_subtract",
        constants=(0.1, 0.2, 0.3, 0.9),
        write_mask="rga",
    )
    img, covered = render_blended(state, backend="pallas")
    expected = blend_numpy(SRC, CLEAR, state)
    np.testing.assert_allclose(img[covered], np.broadcast_to(expected, img[covered].shape), atol=1e-6)


def test_partial_write_mask_two_draws():
    """Second draw writes only G+A over the first draw's output."""
    r = brt.Renderer(SMALL)
    tri = geometry.triangle_mesh_data()
    mesh = r.upload_mesh(tri["positions"] * np.float32([[2.0, 2.0, 0.0]]))
    nodepth = DepthState(test=False, write=False)
    p1 = Pipeline(shader="flat_ndc", depth=nodepth)
    p2 = Pipeline(
        shader="flat_ndc",
        depth=nodepth,
        blend=BlendState(enable=True, src_factor="one", dst_factor="one",
                         write_mask="ga"),
    )
    r.begin_frame(clear_color=CLEAR)
    r.draw(p1, mesh, {"color": SRC})
    r.draw(p2, mesh, {"color": (0.05, 0.06, 0.07, 0.08)})
    f = r.end_frame()
    img = f.color_np()
    covered = np.asarray(f.tri_id) >= 0
    after1 = blend_numpy(SRC, CLEAR, p1.blend)
    after2 = blend_numpy((0.05, 0.06, 0.07, 0.08), after1, p2.blend)
    np.testing.assert_allclose(img[covered], np.broadcast_to(after2, img[covered].shape), atol=1e-6)


def test_bad_blend_state_raises():
    with pytest.raises(ValueError):
        BlendState(src_factor="nope")
    with pytest.raises(ValueError):
        BlendState(color_op="xor")
    with pytest.raises(ValueError):
        BlendState(write_mask="rgz")
    with pytest.raises(ValueError):
        BlendState(write_mask="rr")
    with pytest.raises(ValueError):
        BlendState(constants=(1.0, 0.0))
