"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

All tests run on CPU so they are deterministic, fast to compile, and can
exercise multi-chip sharding logic (pjit/shard_map over a virtual 8-device
mesh) without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
