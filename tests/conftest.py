import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4 TPU translation note (c)).
#
# Note: the environment's sitecustomize pins the `axon` TPU platform, so
# the JAX_PLATFORMS env var alone is not enough — the config update below
# (before any backend is initialized) is what actually selects CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
