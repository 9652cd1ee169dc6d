"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md section 5: sharding
tests assert sharded-vs-replicated equality on simulated devices; Pallas
kernels run in interpret mode on CPU).
"""

import os

# NOTE: this image's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" at interpreter start, so the JAX_PLATFORMS env var
# is ineffective. Override via jax.config BEFORE any backend is instantiated.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-CPU-compile-bound (tiny shapes, hundreds of distinct
# programs): dialing back backend optimization cuts total wall-clock ~30%
# with every correctness tolerance unchanged (kernel-vs-reference and
# sharded-vs-replicated tests compare two programs compiled the same way).
# Opt out (e.g. to reproduce production-compile numerics) with
# VIBO_TEST_FULL_OPT=1.
if ("xla_backend_optimization_level" not in flags
        and not os.environ.get("VIBO_TEST_FULL_OPT")):
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)

# Persistent compilation cache: the suite compiles hundreds of programs and
# many tests rebuild byte-identical HLO through fresh Python closures (the
# in-memory jit cache keys on callable identity, the persistent cache on the
# HLO fingerprint), so this dedupes within one cold run AND makes re-runs
# start warm. Keyed under /tmp per optimization profile; harmless if evicted.
# Opt out with VIBO_TEST_NO_COMPCACHE=1 (e.g. to time true cold compiles).
if not os.environ.get("VIBO_TEST_NO_COMPCACHE"):
    _prof = "fullopt" if os.environ.get("VIBO_TEST_FULL_OPT") else "opt0"
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vibo-test-jaxcache-{_prof}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
