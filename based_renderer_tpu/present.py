"""Present engine: double-buffered async readback + frame pacing (L6).

The reference's present path is the Vulkan swapchain: 2 images, per-image
fences/semaphores, acquire -> submit -> presentKHR, vsync-locked FIFO
(/root/reference/src/main.cpp:1321-1460, 2141-2184), with the fixed
timestep taken from the display refresh rate (main.cpp:1314-1319).

On TPU there is no display engine; "present" is making the rendered frame
available to the host.  The analog of the swapchain is a ring of in-flight
frames exploiting JAX's async dispatch: ``submit`` enqueues a frame's
computation and returns immediately (the vkQueueSubmit analog), and the
ring depth bounds how far the device runs ahead (the fence analog is
blocking on the oldest frame's readback).  ``FramePacer`` supplies
``fixed_dt`` pacing and an FPS counter (the VK_LAYER_LUNARG_monitor
analog, main.cpp:826-829).
"""

from __future__ import annotations

import collections
import time
from typing import Callable, Optional

import jax
import numpy as np


class Swapchain:
    """Ring of in-flight frames over JAX async dispatch.

    depth=2 mirrors the reference's double buffering (image count
    clamp(2, ...), main.cpp:1371-1390).
    """

    def __init__(self, depth: int = 2):
        if depth < 1:
            raise ValueError("swapchain depth must be >= 1")
        self.depth = depth
        self._ring: collections.deque = collections.deque()
        self.presented = 0

    def submit(self, frame) -> Optional[np.ndarray]:
        """Enqueue a rendered frame (device arrays).  Returns the oldest
        completed frame's color image as numpy once the ring is full,
        else None (still warming up)."""
        self._ring.append(frame)
        if len(self._ring) < self.depth:
            return None
        return self._drain_one()

    def _drain_one(self) -> np.ndarray:
        oldest = self._ring.popleft()
        self.presented += 1
        # The fence wait: materialize the oldest frame on the host while
        # newer frames are still being computed on-device.  Prefer the
        # host-side layout conversion (device (H, W, 4) buffers lane-pad
        # 32x — see renderer._blend).
        if hasattr(oldest, "color_np"):
            return oldest.color_np()
        return np.asarray(oldest.color)

    def flush(self) -> list:
        """Wait for everything in flight (the vkDeviceWaitIdle analog)."""
        out = []
        while self._ring:
            out.append(self._drain_one())
        return out


class FramePacer:
    """Fixed-timestep pacing + FPS statistics.

    fixed_dt defaults to 1/60 (the reference computes it from the monitor
    refresh rate, main.cpp:1314-1319; headless TPU has no monitor).
    """

    def __init__(self, fixed_dt: float = 1.0 / 60.0, vsync: bool = False):
        self.fixed_dt = fixed_dt
        self.vsync = vsync  # sleep to pace at fixed_dt (FIFO analog)
        self.t = 0.0
        self._frames = 0
        self._window_start = time.perf_counter()
        self._last = self._window_start
        self.fps = 0.0

    def tick(self) -> float:
        """Advance simulation time by fixed_dt; update FPS; optionally
        sleep to the next vsync slot.  Returns the new animation time."""
        now = time.perf_counter()
        if self.vsync:
            next_slot = self._last + self.fixed_dt
            if now < next_slot:
                time.sleep(next_slot - now)
                now = time.perf_counter()
        self._last = now
        self._frames += 1
        window = now - self._window_start
        if window >= 0.5:
            self.fps = self._frames / window
            self._frames = 0
            self._window_start = now
        self.t += self.fixed_dt
        return self.t


def render_loop(
    renderer,
    demo,
    frames: int = 120,
    on_frame: Optional[Callable] = None,
    vsync: bool = False,
    swapchain_depth: int = 2,
):
    """The demo frame loop (the while(win32_running) analog,
    main.cpp:1876-2187): record -> submit -> present, double buffered.

    demo: (pipeline, mesh, uniforms_fn, instances) as produced by
    models.demos.  Returns (last_image, pacer) for inspection.
    """
    pipeline, mesh, uniforms_fn, instances = demo
    chain = Swapchain(depth=swapchain_depth)
    pacer = FramePacer(vsync=vsync)
    last = None
    for _ in range(frames):
        t = pacer.tick()
        frame = renderer.render_frame(pipeline, mesh, uniforms_fn(t), instances=instances)
        img = chain.submit(frame)
        if img is not None and on_frame is not None:
            on_frame(img, pacer)
        if img is not None:
            last = img
    for img in chain.flush():
        last = img
    return last, pacer
