"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh per the build contract. Must run before jax imports.
"""

import os

# FORCE cpu (not setdefault): tunneled-TPU rigs export JAX_PLATFORMS=axon
# globally, and the axon plugin additionally activates off
# PALLAS_AXON_POOL_IPS regardless of JAX_PLATFORMS — with either in
# effect the suite would silently run through the TPU tunnel (slow,
# link-weather-dependent, and without the 8 virtual devices the mesh
# tests need).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_llvm_disable_expensive_passes" not in flags:
    # see scrooge_tpu/utils/xla_workarounds.py
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

# persistent compilation cache: engine shapes recompile across test runs
# otherwise (tens of seconds per shape on CPU XLA)
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
