"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Bench (bench.py) and the driver's entry() run on real TPU; tests exercise the
multi-chip sharding logic on virtual CPU devices as required.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
