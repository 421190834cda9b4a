"""Test harness: run everything on a virtual 8-device CPU mesh.

This substitutes for the reference's "mpirun -n 8 on one box" style of
multi-process testing (SURVEY.md §4): sharding correctness is validated on
fake CPU devices; the driver separately dry-runs the multi-chip path and
benches on real TPU.

Environment subtlety: this container's sitecustomize imports jax and
registers the tunneled-TPU (axon) PJRT plugin in EVERY python process, and
pins JAX_PLATFORMS=axon — so plain env-var overrides are too late. The
backend, however, is not *initialized* until first use, so forcing the
platform through jax.config here (before any device query) reliably lands
tests on the virtual CPU mesh. Tests must never touch the real chip: the
relay tunnel serializes processes (observed: a second concurrent client
blocks forever) and the TPU's reduced matmul precision breaks f64-grade
oracle comparisons.
"""

import os

# XLA_FLAGS is read at (lazy) backend initialization — safe to set here.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this host has ONE CPU core, so XLA compiles
# dominate suite wall time. Caching makes re-runs compile-free.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)
