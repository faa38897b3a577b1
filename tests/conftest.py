"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding paths run everywhere (the "fake backend" the
reference lacks — SURVEY §4)."""

import os

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS, so the env var alone is not enough — update the config
# after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
