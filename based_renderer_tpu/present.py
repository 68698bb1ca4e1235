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

from .utils.errors import PresentError


class Swapchain:
    """Ring of in-flight frames over JAX async dispatch.

    depth=2 mirrors the reference's double buffering (image count
    clamp(2, ...), main.cpp:1371-1390).

    With ``extent`` given (and the native runtime available), presented
    frames land in a fixed pool of native-arena staging buffers instead
    of fresh numpy allocations — the readback analog of the reference's
    staging-buffer suballocation (vulkan_allocate, main.cpp:314-584).  A
    presented image is then valid until its slot cycles (depth + 1
    presents later); copy it to keep it.
    """

    def __init__(self, depth: int = 2, extent: tuple | None = None):
        if depth < 1:
            raise ValueError("swapchain depth must be >= 1")
        self.depth = depth
        self._ring: collections.deque = collections.deque()
        self.presented = 0
        self._staging = None
        self.extent = None
        if extent is not None:
            self._make_staging(extent)

    def _make_staging(self, extent):
        """(Re)build the staging pool — the swapchain-recreation analog
        (the reference's vk::OutOfDateKHRError path, main.cpp:713-716)."""
        from . import runtime

        self.extent = tuple(extent)
        self._staging = None
        if runtime.available():
            w, h = self.extent
            arena = runtime.Arena()
            idxs = [arena.request(h * w * 4 * 4, 64) for _ in range(self.depth + 1)]
            arena.finalize()
            self._staging = (arena, [arena.view(i, (h, w, 4), np.float32) for i in idxs])

    def resize(self, extent):
        """Recreate staging for a new extent; in-flight frames are drained
        first (the vkDeviceWaitIdle the reference would need)."""
        drained = self.flush()
        self._make_staging(extent)
        return drained

    def submit(self, frame) -> Optional[np.ndarray]:
        """Enqueue a rendered frame (device arrays).  Returns the oldest
        completed frame's color image as numpy once the ring is full,
        else None (still warming up)."""
        if not hasattr(frame, "color_np") and not hasattr(frame, "color"):
            raise PresentError("submit expects a FrameResult-like frame")
        self._ring.append(frame)
        if len(self._ring) < self.depth:
            return None
        return self._drain_one()

    def _drain_one(self) -> np.ndarray:
        oldest = self._ring.popleft()
        # The fence wait: materialize the oldest frame on the host while
        # newer frames are still being computed on-device.  Prefer the
        # host-side layout conversion (device (H, W, 4) buffers lane-pad
        # 32x — see renderer._blend).
        img = oldest.color_np() if hasattr(oldest, "color_np") else np.asarray(oldest.color)
        if self._staging is not None:
            _arena, views = self._staging
            slot = views[self.presented % len(views)]
            if slot.shape != img.shape:
                raise PresentError(
                    f"frame extent {img.shape} does not match swapchain "
                    f"{slot.shape} — call resize() (the OutOfDate analog)"
                )
            np.copyto(slot, img)
            img = slot
        self.presented += 1
        return img

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
    timer=None,
):
    """The demo frame loop (the while(win32_running) analog,
    main.cpp:1876-2187): record -> submit -> present, double buffered.

    demo: (pipeline, mesh, uniforms_fn, instances) as produced by
    models.demos.  Returns (last_image, pacer) for inspection.
    ``timer``: optional utils.profiling.StageTimer — fences and times the
    render and present stages per frame (--profile in the demo driver).
    """
    import contextlib

    pipeline, mesh, uniforms_fn, instances = demo
    cfg = getattr(renderer, "config", None)
    extent = (cfg.width, cfg.height) if cfg is not None else None
    chain = Swapchain(depth=swapchain_depth, extent=extent)
    pacer = FramePacer(vsync=vsync)
    last = None

    def stage(name, fence=None):
        if timer is None:
            return contextlib.nullcontext()
        return timer.stage(name, fence=fence)

    for _ in range(frames):
        t = pacer.tick()
        with stage("record+dispatch"):
            frame = renderer.render_frame(
                pipeline, mesh, uniforms_fn(t), instances=instances
            )
        with stage("present", fence=frame.color_planar if timer else None):
            img = chain.submit(frame)
        if img is not None and on_frame is not None:
            on_frame(img, pacer)
        if img is not None:
            last = img
    for img in chain.flush():
        # Drained frames are real presents: without this the last
        # ``depth`` frames of every run never reach on_frame (a 1-frame
        # run wrote zero PNGs).
        if on_frame is not None:
            on_frame(img, pacer)
        last = img
    # Staged slots cycle after depth+1 presents; hand back a stable copy.
    if last is not None and chain._staging is not None:
        last = last.copy()
    return last, pacer
