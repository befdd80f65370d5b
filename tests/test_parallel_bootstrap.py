"""Self-bootstrap for the multi-device suite on single-device boxes.

On the axon TPU box a sitecustomize on PYTHONPATH registers the tunneled
1-chip backend at interpreter startup, overriding conftest's forced 8-device
CPU mesh — so tests/test_parallel.py would silently skip (round-1 VERDICT).
This test re-runs that suite in a subprocess with the sitecustomize stripped
and the virtual mesh forced, and fails loudly if the suite fails. On runners
where the in-process mesh already has 8 devices it skips (the suite ran
directly).
"""

import os
import subprocess
import sys

import jax
import pytest


def test_parallel_suite_on_virtual_mesh():
    if len(jax.devices()) >= 8:
        pytest.skip("8-device mesh available in-process; suite ran directly")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = ":".join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and "axon" not in p])
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_parallel.py", "-q",
         "--no-header"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"virtual-mesh parallel suite failed:\n{proc.stdout[-4000:]}"
        f"\n{proc.stderr[-2000:]}")
