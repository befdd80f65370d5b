"""Host->device input pipeline: threaded batch production + double buffering.

The reference feeds keras `Sequence` generators synchronously on the host
(SURVEY.md §2.8 — single-threaded numpy inside fit). Here batch synthesis runs
in a background thread pool while the device computes, and the next batch is
transferred (device_put) while the current step executes — the standard
double-buffered TPU feed. On multi-host topologies each process feeds its own
shard (DCN never carries activations).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


def prefetch_to_device(batch_iter: Iterator, size: int = 2,
                       sharding=None) -> Iterator:
    """Wrap a host batch iterator with async device transfer.

    Yields batches already resident on device (optionally with `sharding`
    applied). `size` in-flight batches overlap host synthesis, PCIe/ICI
    transfer, and device compute.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err = []

    def producer():
        try:
            for batch in batch_iter:
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except Exception as e:  # surface producer errors on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def prefetched_epochs(data_generator, n_epochs: int, size: int = 2,
                      sharding=None) -> Iterator:
    """Iterate `n_epochs` epochs of a DataGenerator's (inputs, labels)
    batches with background host synthesis + async device_put (the train-loop
    feed used by every entry point; SURVEY §7.1 'device-prefetch ray batchers
    replacing keras Sequence generators')."""
    import numpy as np

    def host_batches():
        for _ in range(n_epochs):
            for inputs, labels in data_generator.epoch():
                yield (jax.tree_util.tree_map(np.asarray, inputs),
                       jax.tree_util.tree_map(np.asarray, labels))

    return prefetch_to_device(host_batches(), size=size, sharding=sharding)


class GeneratorFeeder:
    """Endless epoch-aware feeder over a tcnerf DataGenerator."""

    def __init__(self, generator, n_epochs: Optional[int] = None,
                 prefetch: int = 2, sharding=None):
        self.generator = generator
        self.n_epochs = n_epochs
        self.prefetch = prefetch
        self.sharding = sharding

    def _epochs(self):
        epoch = 0
        while self.n_epochs is None or epoch < self.n_epochs:
            yield from self.generator.epoch()
            epoch += 1

    def __iter__(self):
        return prefetch_to_device(self._epochs(), self.prefetch, self.sharding)
