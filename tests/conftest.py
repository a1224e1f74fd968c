"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-world answer to "test distributed without a cluster"
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices so every
sharding/pjit path runs the real collective lowering.  The override is
unconditional — the ambient environment may point JAX at a real accelerator
(e.g. JAX_PLATFORMS=axon), and unit tests must not run there.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pin jax to a real accelerator at interpreter startup
# (before conftest runs), in which case the env var above is too late —
# jax.config is the authoritative override and wins over the startup pin.
import jax

jax.config.update("jax_platforms", "cpu")
