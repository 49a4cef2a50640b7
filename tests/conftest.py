"""Test harness config: force an 8-device virtual CPU mesh before jax import.

Mirrors SURVEY.md §4 "Distributed without a cluster": tests must be
CPU-runnable and exercise the multi-chip sharding path on fake devices.
Must run before anything imports jax, hence env mutation at module import.
"""

import os

# Force CPU even when the shell pre-sets JAX_PLATFORMS (e.g. "axon" TPU):
# tests must be hermetic and exercise the 8-fake-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compilation deterministic and quiet in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")
