"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths (pjit/shard_map over a Mesh) are validated the
standard JAX way: XLA's host platform faked into 8 devices. Must be set
before jax initializes, hence the env mutation at import time.
"""

import os

# Force CPU even if the ambient environment points at a TPU (JAX_PLATFORMS
# may be preset to a hardware platform): tests must be deterministic and
# exercise the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: test-suite wall time is dominated by
# CPU jit compiles, which are identical across runs.
import jax  # noqa: E402

# The env var above is only read at jax import time; if a pytest plugin
# imported jax before this conftest, it would be too late — the config
# update below works any time before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# Cache WRITES are disabled by default in full-suite runs: on this
# toolchain, PjRt `executable.serialize()` segfaults deterministically
# after a long-lived process has compiled a few hundred executables
# (reproduced at the same test in four consecutive full-suite runs,
# independent of kernel code; per-file processes never crash). Reads
# stay enabled — warm the cache by running test files individually with
# NSC_TEST_CACHE_WRITES=1 (short processes serialize fine):
#   for f in tests/test_*.py; do NSC_TEST_CACHE_WRITES=1 \
#       python -m pytest $f -q; done
if os.environ.get("NSC_TEST_CACHE_WRITES"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10**9)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def synthetic_scan(rng, n_points=20000, max_r=60.0):
    """A synthetic LiDAR-like scan: points on random directions with
    HDL-64E-ish elevation span, plus some invalid/NaN rows."""
    az = rng.uniform(-np.pi, np.pi, n_points)
    el = rng.uniform(np.deg2rad(-24.8), np.deg2rad(2.0), n_points)
    r = rng.uniform(0.5, max_r, n_points)
    x = r * np.cos(el) * np.cos(az)
    y = r * np.cos(el) * np.sin(az)
    z = r * np.sin(el)
    i = rng.uniform(0, 1, n_points)
    pts = np.stack([x, y, z, i], axis=1).astype(np.float32)
    # sprinkle some NaNs / zero points like real data glitches
    pts[:: max(n_points // 50, 1), 0] = np.nan
    return pts


@pytest.fixture
def scan(rng):
    return synthetic_scan(rng)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Keep the executable population per module bounded: long-lived
    full-suite processes segfault inside XLA compile/serialize once a few
    hundred executables have accumulated (toolchain bug, see the cache
    note above). Warm disk-cache reads make the recompiles cheap."""
    yield
    import jax
    jax.clear_caches()
