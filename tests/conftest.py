"""Test configuration: run the whole suite on 8 virtual CPU devices so
sharding paths (shard_map/psum film merge) are exercised without a TPU pod
(SURVEY.md §4: the standard JAX multi-chip-without-a-cluster trick)."""

import os

# The ambient environment sets JAX_PLATFORMS=axon (a tunnel to one real
# TPU chip) and a sitecustomize that imports jax at interpreter startup —
# so setting env vars here is NOT enough; the jax.config.update below is
# what actually forces CPU after that import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# XLA-CPU compiles of the big render graphs / interpret-mode Pallas
# kernels dominate suite time; a persistent cache makes repeat runs
# (local dev, driver re-runs) several minutes faster.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAYN_JAX_TEST_CACHE",
                                 "/tmp/rayn_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
