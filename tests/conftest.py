"""Test harness config: force CPU with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY §4 item 3).

NOTE: the driver environment pre-imports jax (sitecustomize) with the TPU
tunnel platform selected, so env vars alone are too late here — the platform
must be switched via jax.config. XLA_FLAGS still works because the CPU
backend has not been initialised yet at conftest import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# no persistent compile cache under tests (must be set before the
# package import enables it): CPU AOT cache entries record host machine
# features and XLA warns of SIGILL on mismatch — the cache exists to
# save remote-TPU compiles, worthless for these tiny programs
os.environ["ASR_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
