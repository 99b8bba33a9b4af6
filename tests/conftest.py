"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code is validated on
a virtual CPU mesh exactly as SURVEY.md §4 prescribes
(``--xla_force_host_platform_device_count``). The axon sitecustomize pins
``JAX_PLATFORMS=axon`` at interpreter start, so we must override through
``jax.config`` (before any backend is initialized), not just the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
