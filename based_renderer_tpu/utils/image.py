"""Image IO: PNG/PPM writing for framebuffer readback.

Pure-Python PNG encoder (zlib stored blocks via the stdlib) so demos have
no dependency beyond numpy; PIL is used opportunistically when present.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_u8(img: np.ndarray) -> np.ndarray:
    """float [0,1] (H, W, 3|4) -> uint8, clipping."""
    if img.dtype == np.uint8:
        return img
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """Write (H, W, 1|3|4) uint8/float image as PNG."""
    arr = to_u8(np.asarray(img))
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, img: np.ndarray) -> None:
    arr = to_u8(np.asarray(img))[..., :3]
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())
