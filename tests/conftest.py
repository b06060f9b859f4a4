"""Test configuration: force an 8-device virtual CPU mesh.

The axon TPU plugin's sitecustomize calls jax.config.update("jax_platforms",
"axon,cpu") at interpreter start, overriding JAX_PLATFORMS env.  Tests run on
virtual CPU devices (fast eager dispatch + multi-chip mesh emulation), so we
override the config back to cpu before any backend initializes.  Bench and
the driver's entry() still run on the real TPU (they don't import this).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the limb-arithmetic graphs are large (L=16 fields)
# and identical across runs.  Lives under ~/.cache (not /tmp) so it survives
# tmp cleanup — a cold-cache full run is ~35 min, warm ~6-10 min.
_cache_dir = os.path.expanduser("~/.cache/lcpc_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
