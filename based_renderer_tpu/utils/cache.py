"""Persistent compilation cache (the on-disk pipeline-cache analog).

The reference creates a ``vk::PipelineCache`` but never serializes it
(/root/reference/src/main.cpp:1626-1633 — the commented-out
``read_entire_file`` at main.cpp:72-88 hints at the plan).  Here the
equivalent is JAX's persistent compilation cache: enabling it makes every
compiled frame program (including multi-minute Pallas kernels on remote
TPU backends) survive process restarts.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/based_renderer_tpu/xla")


def enable_persistent_cache(directory: str | None = None, min_compile_secs: float = 0.5):
    """Enable the on-disk compile cache for all subsequently-compiled
    frame programs.  Call once at startup."""
    directory = directory or DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return directory
