"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon
pinned to the tunneled TPU, so the env var alone is not enough — the platform
must be overridden via jax.config after import, before first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Guard against accidental backend initialization before this point.
assert jax.default_backend() == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# Persistent compile cache: XLA-CPU compiles of renderer-sized programs take
# minutes on this 1-core box; repeat runs must hit the disk cache.
from raytracer3_tpu.utils import runtime  # noqa: E402

runtime.init_compilation_cache()
