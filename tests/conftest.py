"""Test harness config: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4 "Distributed without a cluster": tests must be
CPU-runnable and exercise the multi-chip sharding path on fake devices.

Gotcha (environment-specific): this image preloads jax at interpreter
startup with JAX_PLATFORMS=axon (the tunneled TPU), so JAX's config has
already captured the env var — mutating os.environ here is too late for the
platform choice. ``jax.config.update`` works because the backend itself is
initialized lazily; XLA_FLAGS is still read at backend-init time, so the
fake-device flag can go through the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
