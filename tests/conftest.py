"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Multi-chip logic is validated on virtual CPU devices (the reference's analog:
multi-GPU tests skip below a device-count threshold; see SURVEY.md §4). Real
TPU hardware is exercised by bench.py, not the test suite.

Note: this image preimports jax at interpreter startup (axon sitecustomize)
with JAX_PLATFORMS=axon, so the env var alone is not enough — we must also
override the already-loaded config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
