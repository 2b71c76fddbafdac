"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic runs in CI without TPUs via XLA's host-platform
device-count flag (the "fake backend" strategy, SURVEY.md section 4).

The session environment pre-imports jax with JAX_PLATFORMS=axon (the real TPU
tunnel) via sitecustomize, so plain env manipulation is too late — the
platform must be switched through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
