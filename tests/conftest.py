"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU so they are deterministic, fast, and can exercise
multi-chip sharding logic (pjit/shard_map over a virtual 8-device mesh)
without TPU hardware.

Two layers of forcing are needed: the env vars must be set before JAX
import, AND the platform must be re-pinned after import because this
machine's axon TPU plugin force-sets ``jax_platforms="axon,cpu"`` during its
site-hook registration (overriding the env var).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
