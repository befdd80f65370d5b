"""Persistent JAX compile-cache activation that actually works under axon.

Root cause (round 5): the axon TPU sitecustomize imports jax at interpreter
startup, so `JAX_COMPILATION_CACHE_DIR` set by a script (or setdefault'ed
before `import jax`) is latched too late — jax's env-var config snapshot was
already taken. Every earlier "the axon platform does not populate the cache"
observation (docs/perf_notes.md round 4) was this plumbing bug: setting
`jax.config.update("jax_compilation_cache_dir", ...)` at runtime initializes
the cache fine, executables serialize (verified: cross-process cache hit in
0.4 s vs multi-second compile), and remote compiles are skipped entirely.

Call `enable_compile_cache()` after `import jax` in every entry point that
compiles nontrivial programs (bench, tools/bench_*, train entry points).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Activate the persistent compile cache at `path` (default: repo
    .jax_cache, overridable with TCNERF_JAX_CACHE_DIR). Safe to call more
    than once; returns the cache directory."""
    import jax

    path = path or os.environ.get("TCNERF_JAX_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
