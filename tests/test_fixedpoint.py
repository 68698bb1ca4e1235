"""Unit tests for the emulated 64-bit integer arithmetic and snap spec."""

import numpy as np
import jax.numpy as jnp

from based_renderer_tpu.ops import fixedpoint as fp


def _pairs_to_py(hi, lo):
    hi = np.asarray(hi, np.int64)
    lo_u = np.asarray(lo).astype(np.uint32).astype(np.int64)
    return hi * (1 << 32) + lo_u


def test_i64_mul_random():
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**31), 2**31, size=2048, dtype=np.int64).astype(np.int32)
    b = rng.integers(-(2**31), 2**31, size=2048, dtype=np.int64).astype(np.int32)
    hi, lo = fp.i64_mul_i32(jnp.asarray(a), jnp.asarray(b))
    got = _pairs_to_py(hi, lo)
    want = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(got.astype(object), want)


def test_i64_mul_edge_cases():
    cases = [
        (0, 0),
        (1, -1),
        (-1, -1),
        (2**31 - 1, 2**31 - 1),
        (-(2**31), 2**31 - 1),
        (-(2**31), -(2**31)),
        (65536, 65536),
        (-65536, 65537),
    ]
    a = jnp.asarray([c[0] for c in cases], jnp.int32)
    b = jnp.asarray([c[1] for c in cases], jnp.int32)
    hi, lo = fp.i64_mul_i32(a, b)
    got = _pairs_to_py(hi, lo)
    want = np.array([int(x) * int(y) for x, y in cases], dtype=object)
    np.testing.assert_array_equal(got.astype(object), want)


def test_i64_add_neg_carry():
    rng = np.random.default_rng(1)
    x = rng.integers(-(2**62), 2**62, size=1024)
    y = rng.integers(-(2**62), 2**62, size=1024)

    def split(v):
        hi = (v >> 32).astype(np.int32)
        lo = (v & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        return jnp.asarray(hi), jnp.asarray(lo)

    s = fp.i64_add(split(x), split(y))
    np.testing.assert_array_equal(_pairs_to_py(*s), x + y)
    n = fp.i64_neg(split(x))
    np.testing.assert_array_equal(_pairs_to_py(*n), -x)


def test_i64_clamp():
    vals = np.array([-(2**40), -5, 0, 7, 2**35, 2**30, -(2**31)], dtype=np.int64)
    hi = jnp.asarray((vals >> 32).astype(np.int32))
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32).view(np.int32))
    c = fp.i64_clamp_to_i32((hi, lo), -fp.ANCHOR_CLAMP, fp.ANCHOR_CLAMP)
    want = np.clip(vals, -fp.ANCHOR_CLAMP, fp.ANCHOR_CLAMP).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(c), want)


def test_snap_matches_numpy_rint():
    x = jnp.asarray(np.linspace(-10000.0, 10000.0, 4097, dtype=np.float32))
    got = np.asarray(fp.snap_fixed(x))
    want = np.clip(
        np.rint(np.asarray(x) * np.float32(16)).astype(np.int64), fp.GUARD_LO, fp.GUARD_HI
    ).astype(np.int32)
    np.testing.assert_array_equal(got, want)
