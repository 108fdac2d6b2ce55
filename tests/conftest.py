"""Test configuration: force CPU with a virtual 8-device mesh.

This is the JAX-native way to test multi-chip sharding without hardware
(SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8.
Must run before jax is first imported by any test module.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of pytest rootdir.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and overrides
# JAX_PLATFORMS; pin the config directly so tests always run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
# compile time dominates these CPU tests (1 core); numerics are unaffected
# by skipping XLA's expensive optimization passes
jax.config.update("jax_disable_most_optimizations", True)
# persistent compile cache: local reruns and CI (actions/cache on this dir)
# skip recompilation entirely for unchanged test graphs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_comp_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402

# --- memory-map guard -------------------------------------------------------
# XLA:CPU's LLVM ORC JIT creates ~3 anonymous maps per compiled executable
# (~800 maps/test across this suite).  A full single-process run exceeds the
# kernel's vm.max_map_count default (65530), after which mmap failures
# SEGFAULT the JIT mid-compile — and the truncated entry it leaves behind
# poisons the persistent compile cache for every later run.  Dropping JAX's
# executable caches before the ceiling keeps long runs safe; recompiles of
# repeated graphs are served by the persistent cache on disk.
_MAP_GUARD_THRESHOLD = 40_000


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no /proc, and no map-count ceiling concern
        return 0


def pytest_runtest_teardown(item, nextitem):
    if nextitem is not None and _map_count() > _MAP_GUARD_THRESHOLD:
        import gc

        jax.clear_caches()
        gc.collect()


@pytest.fixture(scope="session")
def g1_xml():
    from add_gym_tpu.utils.assets import asset_path

    return asset_path("g1_description/g1_29.xml")
