"""Native C++ runtime: arena allocator, pacer, image IO, present ring."""

import os
import tempfile

import numpy as np
import pytest

from based_renderer_tpu import runtime

pytestmark = pytest.mark.skipif(not runtime.available(), reason="native runtime not built")


def test_arena_batched_layout():
    a = runtime.Arena()
    i0 = a.request(100, alignment=64)
    i1 = a.request(1000, alignment=64)
    i2 = a.request(17, alignment=4096)
    a.finalize()
    # Two alignment classes -> two backing groups (the memory-type
    # grouping of vulkan_allocate).
    assert a.num_groups == 2
    v0 = a.view(i0, (100,))
    v1 = a.view(i1, (1000,))
    v2 = a.view(i2, (17,))
    v0[:] = 1
    v1[:] = 2
    v2[:] = 3
    # Distinct, non-overlapping buffers with requested alignment.
    assert v0.ctypes.data % 64 == 0
    assert v2.ctypes.data % 4096 == 0
    assert (v0 == 1).all() and (v1 == 2).all() and (v2 == 3).all()
    assert a.total_bytes >= 1117


def test_arena_dedicated_allocations():
    """The vk::MemoryDedicatedAllocateInfo analog: explicit or
    size-promoted requests get their own backing block instead of a slot
    in an alignment group."""
    a = runtime.Arena()
    a.set_dedicated_threshold(1 << 20)  # 1 MiB for the test
    i_small = a.request(100, alignment=64)
    i_flag = a.request(200, alignment=64, dedicated=True)
    i_big = a.request((1 << 20) + 5, alignment=64)  # auto-promoted
    a.finalize()
    assert a.num_groups == 1  # only the small request shares a group
    assert a.num_dedicated == 2
    vs = a.view(i_small, (100,))
    vf = a.view(i_flag, (200,))
    vb = a.view(i_big, ((1 << 20) + 5,))
    vs[:] = 1
    vf[:] = 2
    vb[:] = 3
    assert (vs == 1).all() and (vf == 2).all() and (vb == 3).all()
    assert vf.ctypes.data % 64 == 0 and vb.ctypes.data % 64 == 0
    assert a.total_bytes >= (1 << 20) + 305

    # Threshold 0 disables auto-promotion; explicit still honored.
    b = runtime.Arena()
    b.set_dedicated_threshold(0)
    b.request(64 << 20, alignment=64)
    b.request(10, alignment=64, dedicated=True)
    b.finalize()
    assert b.num_groups == 1 and b.num_dedicated == 1


def test_arena_rejects_bad_requests():
    a = runtime.Arena()
    with pytest.raises(ValueError):
        a.request(10, alignment=48)  # not a power of two
    a.request(10)
    a.finalize()
    with pytest.raises(ValueError):
        a.request(10)  # after finalize


def test_pacer_ticks():
    p = runtime.NativePacer(fixed_dt=0.001, vsync=True)
    t = 0.0
    for _ in range(5):
        t = p.tick()
    assert abs(t - 0.005) < 1e-9


def test_f32_to_u8_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(-0.2, 1.2, (16, 16, 4)).astype(np.float32)
    got = runtime.f32_to_u8(img)
    want = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_write_png_roundtrip():
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (20, 30, 4), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.png")
        runtime.write_png(path, img)
        back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)


def test_present_ring_writes_frames():
    with tempfile.TemporaryDirectory() as d:
        ring = runtime.PresentRing(32, 16, depth=2, out_dir=d)
        frames = [np.full((16, 32, 4), i / 4, np.float32) for i in range(4)]
        for f in frames:
            ring.submit(f)
        ring.flush()
        assert ring.presented == 4
        files = sorted(os.listdir(d))
        assert files == [f"frame_{i:06d}.png" for i in range(4)]
        ring.close()


def test_f32_to_u8_srgb_matches_python():
    """Native sRGB encode is bit-identical to utils.image.to_u8(srgb=True)
    (both compute the transfer function in double on this host's libm)."""
    from based_renderer_tpu.utils import image

    rng = np.random.default_rng(2)
    img = rng.uniform(-0.2, 1.2, (16, 16, 4)).astype(np.float32)
    got = runtime.f32_to_u8(img, srgb=True)
    want = image.to_u8(img, srgb=True)
    np.testing.assert_array_equal(got, want)


def test_srgb_encode_anchors():
    from based_renderer_tpu.utils import image

    # Known sRGB anchor points: 0 -> 0, 1 -> 255, linear 0.5 -> 188
    # (sRGB(0.5) = 0.735357 -> 187.5 + 0.5 rounds to 188); the linear
    # segment boundary 0.0031308 -> 12.92 * 0.0031308 * 255 ~ 10.3 -> 10.
    px = np.asarray(
        [[[0.0, 1.0, 0.5, 0.5]], [[0.0031308, 0.25, 0.75, 1.0]]], np.float32
    )
    u8 = image.to_u8(px, srgb=True)
    assert u8[0, 0, 0] == 0 and u8[0, 0, 1] == 255
    assert u8[0, 0, 2] == 188
    assert u8[0, 0, 3] == 128  # alpha stays linear
    assert u8[1, 0, 0] == 10
    # Monotone and >= linear encode everywhere on [0, 1] RGB.
    ramp = np.linspace(0, 1, 257, dtype=np.float32).reshape(1, -1, 1)
    enc = image.srgb_encode(ramp)
    assert np.all(np.diff(enc[0, :, 0]) >= 0)
    # Compare in float64: 1e-12 is below float32 resolution near 1.0.
    assert np.all(enc >= ramp.astype(np.float64) - 1e-12)


def test_present_ring_srgb_flag():
    from PIL import Image

    from based_renderer_tpu.utils import image

    img = np.full((16, 32, 4), 0.5, np.float32)
    with tempfile.TemporaryDirectory() as d:
        ring = runtime.PresentRing(32, 16, depth=2, out_dir=d, srgb=True)
        ring.submit(img)
        ring.flush()
        ring.close()
        back = np.asarray(Image.open(os.path.join(d, "frame_000000.png")))
    np.testing.assert_array_equal(back, image.to_u8(img, srgb=True))
