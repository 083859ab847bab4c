"""Test configuration: run the whole suite on 8 virtual CPU devices so
sharding paths (shard_map/psum film merge) are exercised without a TPU pod
(SURVEY.md §4: the standard JAX multi-chip-without-a-cluster trick)."""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (a tunnel to
# one real TPU chip), which is wrong for unit tests — slow per-op dispatch
# and no multi-device simulation.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
