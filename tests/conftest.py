"""Test environment: force an 8-device virtual CPU mesh.

All unit tests run on CPU so they are deterministic and don't contend for
the single real TPU chip; sharding tests get 8 virtual devices.

The container's sitecustomize pre-imports jax and registers the axon TPU
backend before any conftest runs, so plain env vars are too late — we
flip the platform through jax.config and clear any initialized backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # pin codegen to AVX2: the persistent compile cache is COMMITTED and
    # shared across machines — an entry compiled with host-specific ISA
    # (AVX-512/AMX + prefer-no-gather) segfaults when deserialized on a
    # host without those features (observed: SIGSEGV in
    # compilation_cache.get_executable_and_time)
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
try:  # drop any backend the sitecustomize already initialized
    jax.extend.backend.clear_backends()
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", (
    "unit tests must run on the virtual CPU mesh, got %s" % jax.devices())

# persistent compilation cache: the suite's wall clock is dominated by
# XLA compiles of the big fused pipeline programs; caching them across
# pytest invocations turns a ~10 min cold run into seconds warm
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
