"""Test config: force an 8-device virtual CPU mesh before JAX import.

Mirrors SURVEY §4's recommendation: run the statistical tiers on CPU and
exercise the multi-device sharding path with
``--xla_force_host_platform_device_count``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
