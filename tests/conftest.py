"""Test configuration: force the CPU backend with 8 virtual devices.

Real-TPU checks live in tools/tpu_checks.py and run as a separate process
against the default (axon TPU) environment.
"""

import os

# Must be set before jax is imported anywhere in the test process.  The
# session environment pins JAX_PLATFORMS=axon (the tunneled TPU); unit tests
# run on the virtual 8-device CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: recompiling every test run on the 1-core CI
# host dominates wall time otherwise.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/brt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon sitecustomize registers the TPU plugin and forces the platform
# regardless of JAX_PLATFORMS, so override at the config level too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
