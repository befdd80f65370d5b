"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard fake-backend substitute for a TPU pod slice — multi-chip
sharding paths compile and execute against 8 host devices (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# NOTE: under the axon TPU tunnel environment its sitecustomize (on
# PYTHONPATH) overrides the forced CPU device count, so jax.devices() is 1
# there and the multi-device tests skip (tests/test_parallel.py guards on
# device count). Re-exec'ing pytest from conftest is NOT safe — pytest's
# capture manager has already redirected the output fds, so the re-exec'd
# run is silent. Run `python -m pytest` with the axon path stripped from
# PYTHONPATH (or use `python __graft_entry__.py`) to exercise the 8-device
# mesh locally; CI/driver harnesses without the sitecustomize get 8 devices
# from the flags above automatically.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: this machine has a single CPU core and XLA
# compiles of the full models take minutes; caching makes reruns near-instant.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
