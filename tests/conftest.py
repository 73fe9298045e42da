"""Test environment: force an 8-device virtual CPU mesh.

All unit tests run on CPU so they are deterministic and don't contend for
the single real TPU chip; sharding tests get 8 virtual devices.

The container's sitecustomize pre-imports jax and registers the axon TPU
backend before any conftest runs, so plain env vars are too late — we
flip the platform through jax.config and clear any initialized backends.
"""

import os

# Raise the main-thread stack ceiling: XLA:CPU's LLVM passes recurse
# deeply while compiling the big joint VI programs, and under a tall
# pytest/Python stack the default 8 MB overflows — observed as
# deterministic SIGSEGV in backend_compile_and_load (and, when the
# entry came from the persistent cache, in its deserializer). The main
# thread's stack grows dynamically up to the soft rlimit, so raising it
# here (before any deep compile) is sufficient.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: do NOT pin --xla_cpu_max_isa here. An AVX2 pin was tried to make
# cache entries portable across machines; on the giant fused/VI programs
# the 8-wide codegen blows LLVM's JIT memory ("LLVM compilation error:
# Cannot allocate memory", later SIGSEGV). The compile cache is
# machine-local (gitignored) instead, so portability is moot.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU JIT-compiles each program as N parallel LLVM splits
    # (default 32), each registering eh-frame tables concurrently;
    # glibc's unwinder walking those tables mid-registration is the
    # prime suspect for the libgcc_s segfaults observed deep into long
    # runs (see the lore note below). One split serializes registration
    # — and costs nothing on this 1-CPU host.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
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
# cache EVERYTHING (no 0.5 s threshold): the long single-process suite
# accumulates LLVM JIT state with every fresh compile and can segfault
# compiling a big program late in the run (see lore below) — sub-0.5 s
# programs that are never cached re-JIT on every run and recreate that
# cumulative state even on warm reruns. With a full cache, a crashed
# run persists everything it compiled and the rerun JITs almost nothing.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# XLA:CPU segfault lore (do not re-litigate without new evidence): long
# e2e processes can SIGSEGV *while compiling* a later program — the
# kernel log places the fault inside libgcc_s's unwinder, i.e. C++
# exception unwinding tripping over the cumulative JIT frame-table
# state after hundreds of compiled programs. It is NOT the persistent
# cache: JAX compiles through the identical backend_compile_and_load
# call with or without a cache dir (compiler.py:430-485), and the same
# program compiles fine in a fresh process. Mitigations that work:
# (a) keep programs small (edge-local AD in vi_ba.py — the wide-jacfwd
# joint VI programs were the trigger), and (b) keep the warm cache ON:
# cache hits skip JIT entirely, and a crashed run still persists what
# it compiled, so reruns converge past the crash point.



# --- collection order: heaviest programs first -----------------------------
# XLA:CPU segfault lore, continued (round 4): the suite now compiles more
# large programs (fused mapping kernels), and the long single-process run
# started segfaulting while COMPILING OR LOADING the biggest executable
# (posegraph.optimize_sim3_graph, ~63% into the run) — deterministically,
# yet the same test passes in a fresh process via both the compile and the
# cache-read path. The trigger is cumulative per-process JIT state (eh-frame
# registration across hundreds of loaded programs), not the program itself.
# Mitigation with evidence from round 3's "construction-time warm-up":
# load the big programs while the process is YOUNG — hoist the heavy test
# modules to the front of the collection order.
_HEAVY_FIRST = ["test_loopclosing", "test_vi_ba", "test_parallel",
                "test_e2e_pipelined", "test_e2e_mono"]


def pytest_collection_modifyitems(config, items):
    def key(item):
        name = item.module.__name__.rsplit(".", 1)[-1]
        try:
            return (_HEAVY_FIRST.index(name), 0)
        except ValueError:
            return (len(_HEAVY_FIRST), 0)
    items.sort(key=key)
