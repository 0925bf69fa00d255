"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (SURVEY.md §4 item 4).

The session env registers the axon TPU plugin via a sitecustomize on
PYTHONPATH and sets JAX_PLATFORMS=axon; env vars alone don't undo that, so
the platform is forced back to CPU through jax.config after import. Tests
must never compete with interactive work for the single tunneled TPU chip.
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
jax.config.update("jax_enable_x64", False)
