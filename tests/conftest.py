"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake backend (SURVEY.md §4): sharding
and collective code paths are exercised via
``--xla_force_host_platform_device_count`` without real chips.

Note: this environment's sitecustomize force-registers the axon TPU plugin
and sets the ``jax_platforms`` *config* (not just the env var), so we must
override via ``jax.config.update`` — the env var alone is ignored.
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
