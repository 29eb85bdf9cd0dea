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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
