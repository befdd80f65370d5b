"""Multi-host (DCN) support: process initialization and per-host input sharding.

The reference is strictly single-process (SURVEY.md §2.13). Here:
  * `initialize()` wires jax.distributed when launched under a multi-host
    runtime (no-ops on a single host);
  * `host_shard_indices(n)` partitions a dataset across processes so each
    host's input pipeline feeds only its local shard (DCN carries no
    activations — only the independent host->device feeds);
  * `global_batch_array` assembles a jax.Array from per-host shards via
    `jax.make_array_from_process_local_data` for dp meshes spanning hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when configured; safe no-op otherwise."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_shard_indices(n_samples: int, rng=None) -> np.ndarray:
    """This process's sample indices (contiguous block partitioning)."""
    p = jax.process_index()
    n_p = jax.process_count()
    per = -(-n_samples // n_p)
    idx = np.arange(n_samples)
    if rng is not None:
        np.random.default_rng(rng).shuffle(idx)
    return idx[p * per:(p + 1) * per]


def global_batch_array(local_batch: np.ndarray, sharding) -> jax.Array:
    """Per-host numpy shard -> global jax.Array under `sharding`."""
    return jax.make_array_from_process_local_data(sharding, local_batch)
