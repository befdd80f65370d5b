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

# Under the axon TPU tunnel environment its sitecustomize (on PYTHONPATH)
# pins the platform at interpreter start, so the JAX_PLATFORMS=cpu above does
# NOT stick: a bare `pytest` silently compiles every test through the remote
# TPU tunnel and appears to hang for many minutes. Re-exec'ing pytest from
# conftest is NOT safe either — pytest's capture manager has already
# redirected the output fds, so a re-exec'd run is silent. Fail fast with the
# working command instead. Deliberate TPU test runs (the TPU-only kernel
# parity tests) opt in via TCNERF_TPU_TESTS=1.
_axon_paths = [p for p in sys.path if "axon" in p]
if _axon_paths and os.environ.get("TCNERF_TPU_TESTS") != "1":
    raise SystemExit(
        "tests/conftest.py: the axon TPU sitecustomize is on PYTHONPATH "
        f"({_axon_paths[0]}); it pins the TPU platform so the 8-device "
        "virtual CPU mesh cannot be forced and the suite would compile "
        "through the remote tunnel (minutes per test, no output).\n"
        "Run instead:  PYTHONPATH= python -m pytest tests/ -q\n"
        "Or, to run the TPU-only kernel tests on the real chip deliberately: "
        "TCNERF_TPU_TESTS=1 python -m pytest tests/ -q")

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
