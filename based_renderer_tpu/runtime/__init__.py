"""Native host runtime bindings (ctypes over the C++ brt_runtime library).

The compute path is XLA/Pallas; the host-side runtime around it — the
batched staging allocator, frame pacer, image encoders, and the
background present ring — is C++ (runtime/native/brt_runtime.cpp), the
same split of responsibilities as the reference's all-C++ host runtime.

The library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes).  ``available()`` reports whether the native path
loaded; every consumer has a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "brt_runtime.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libbrt_runtime.so")
_lib = None
_lock = threading.Lock()


def build(force: bool = False) -> str:
    """Compile the native runtime (cached)."""
    if not force and os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB_PATH,
        "-lz",
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            path = build()
            lib = ctypes.CDLL(path)
        except Exception:
            return None
        c = ctypes
        lib.brt_arena_create.restype = c.c_void_p
        lib.brt_arena_request.restype = c.c_int32
        lib.brt_arena_request.argtypes = [c.c_void_p, c.c_uint64, c.c_uint64]
        lib.brt_arena_request_ex.restype = c.c_int32
        lib.brt_arena_request_ex.argtypes = [
            c.c_void_p,
            c.c_uint64,
            c.c_uint64,
            c.c_int32,
        ]
        lib.brt_arena_set_dedicated_threshold.argtypes = [c.c_void_p, c.c_uint64]
        lib.brt_arena_num_dedicated.restype = c.c_int32
        lib.brt_arena_num_dedicated.argtypes = [c.c_void_p]
        lib.brt_arena_finalize.restype = c.c_int32
        lib.brt_arena_finalize.argtypes = [c.c_void_p]
        lib.brt_arena_ptr.restype = c.c_void_p
        lib.brt_arena_ptr.argtypes = [c.c_void_p, c.c_int32]
        lib.brt_arena_total_bytes.restype = c.c_uint64
        lib.brt_arena_total_bytes.argtypes = [c.c_void_p]
        lib.brt_arena_num_groups.restype = c.c_int32
        lib.brt_arena_num_groups.argtypes = [c.c_void_p]
        lib.brt_arena_destroy.argtypes = [c.c_void_p]
        lib.brt_pacer_create.restype = c.c_void_p
        lib.brt_pacer_create.argtypes = [c.c_double, c.c_int32]
        lib.brt_pacer_tick.restype = c.c_double
        lib.brt_pacer_tick.argtypes = [c.c_void_p]
        lib.brt_pacer_fps.restype = c.c_double
        lib.brt_pacer_fps.argtypes = [c.c_void_p]
        lib.brt_pacer_destroy.argtypes = [c.c_void_p]
        lib.brt_f32_to_u8.argtypes = [c.c_void_p, c.c_void_p, c.c_int64]
        lib.brt_f32_to_u8_srgb.argtypes = [c.c_void_p, c.c_void_p, c.c_int64]
        lib.brt_write_png.restype = c.c_int32
        lib.brt_write_png.argtypes = [c.c_char_p, c.c_void_p, c.c_int32, c.c_int32, c.c_int32]
        lib.brt_write_ppm.restype = c.c_int32
        lib.brt_write_ppm.argtypes = [c.c_char_p, c.c_void_p, c.c_int32, c.c_int32]
        lib.brt_present_create.restype = c.c_void_p
        lib.brt_present_create.argtypes = [
            c.c_int32,
            c.c_int32,
            c.c_int32,
            c.c_char_p,
            c.c_int32,
        ]
        lib.brt_present_submit.restype = c.c_uint64
        lib.brt_present_submit.argtypes = [c.c_void_p, c.c_void_p]
        lib.brt_present_flush.argtypes = [c.c_void_p]
        lib.brt_present_count.restype = c.c_uint64
        lib.brt_present_count.argtypes = [c.c_void_p]
        lib.brt_present_destroy.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class Arena:
    """Batched, alignment-grouped host buffer allocator (the
    vulkan_allocate analog: request everything, finalize once)."""

    def __init__(self):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = self._lib.brt_arena_create()
        self._finalized = False

    def request(self, size: int, alignment: int = 64, dedicated: bool = False) -> int:
        """Request a buffer.  ``dedicated`` forces the request onto its
        own backing block (the reference's vk::MemoryDedicatedAllocateInfo
        path, main.cpp:379-398); requests >= the arena's dedicated
        threshold (default 32 MiB) are promoted automatically."""
        idx = self._lib.brt_arena_request_ex(
            self._h, size, alignment, 1 if dedicated else 0
        )
        if idx < 0:
            raise ValueError("bad arena request (finalized? non-pow2 alignment?)")
        return idx

    def set_dedicated_threshold(self, bytes_: int):
        """Auto-promotion size threshold; 0 disables auto-promotion."""
        self._lib.brt_arena_set_dedicated_threshold(self._h, bytes_)

    def finalize(self):
        if self._lib.brt_arena_finalize(self._h) != 0:
            raise MemoryError("arena finalize failed")
        self._finalized = True

    def view(self, index: int, shape, dtype=np.uint8) -> np.ndarray:
        """numpy view of a bound buffer (zero copy)."""
        ptr = self._lib.brt_arena_ptr(self._h, index)
        if not ptr:
            raise ValueError("unbound buffer (finalize first)")
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        buf = (ctypes.c_uint8 * nbytes).from_address(ptr)
        return np.frombuffer(buf, dtype=dtype).reshape(shape)

    @property
    def total_bytes(self) -> int:
        return self._lib.brt_arena_total_bytes(self._h)

    @property
    def num_groups(self) -> int:
        return self._lib.brt_arena_num_groups(self._h)

    @property
    def num_dedicated(self) -> int:
        return self._lib.brt_arena_num_dedicated(self._h)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.brt_arena_destroy(self._h)
            self._h = None


class NativePacer:
    """C++ frame pacer (fixed-dt + FPS), preferred over present.FramePacer
    when the native runtime is available."""

    def __init__(self, fixed_dt: float = 1 / 60, vsync: bool = False):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = self._lib.brt_pacer_create(fixed_dt, 1 if vsync else 0)
        self.fixed_dt = fixed_dt

    def tick(self) -> float:
        return self._lib.brt_pacer_tick(self._h)

    @property
    def fps(self) -> float:
        return self._lib.brt_pacer_fps(self._h)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.brt_pacer_destroy(self._h)
            self._h = None


class PresentRing:
    """Background present thread + bounded frame ring (swapchain analog).

    Frames submitted as float32 (H, W, 4) numpy arrays are converted and
    written as PNGs (or dropped, display-less) off the Python thread;
    submit blocks only when ``depth`` frames are in flight.
    """

    def __init__(
        self,
        width: int,
        height: int,
        depth: int = 2,
        out_dir: str | None = None,
        srgb: bool = False,
    ):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self.width, self.height = width, height
        self._h = self._lib.brt_present_create(
            width, height, depth, out_dir.encode() if out_dir else None,
            1 if srgb else 0,
        )

    def submit(self, rgba_f32: np.ndarray) -> int:
        from ..utils.errors import PresentError

        a = np.ascontiguousarray(rgba_f32, np.float32)
        if a.shape != (self.height, self.width, 4):
            raise PresentError(
                f"present expects ({self.height}, {self.width}, 4), got {a.shape}"
            )
        return self._lib.brt_present_submit(self._h, a.ctypes.data)

    def flush(self):
        self._lib.brt_present_flush(self._h)

    @property
    def presented(self) -> int:
        return self._lib.brt_present_count(self._h)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.brt_present_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()


def write_png(path: str, img_u8: np.ndarray) -> None:
    lib = _load()
    a = np.ascontiguousarray(img_u8)
    h, w = a.shape[:2]
    c = 1 if a.ndim == 2 else a.shape[2]
    rc = lib.brt_write_png(path.encode(), a.ctypes.data, w, h, c)
    if rc != 0:
        from ..utils.errors import PresentError

        raise PresentError(f"brt_write_png failed: {rc}")


def f32_to_u8(img: np.ndarray, srgb: bool = False) -> np.ndarray:
    """f32 [0,1] -> u8; srgb applies the transfer function to RGB (the
    flat buffer is treated as RGBA quads — alpha stays linear)."""
    lib = _load()
    a = np.ascontiguousarray(img, np.float32)
    out = np.empty(a.shape, np.uint8)
    fn = lib.brt_f32_to_u8_srgb if srgb else lib.brt_f32_to_u8
    fn(a.ctypes.data, out.ctypes.data, a.size)
    return out
