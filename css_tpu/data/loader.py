"""Asynchronous host->device prefetching.

Replaces the reference's torch DataLoader with worker processes
(scripts/python/train.py:147-158): a pool of producer threads runs the
mixture synthesizer ahead of the training loop (the numpy/scipy/C++ ops
release the GIL) and stages ready batches on device, so the TPU never
waits on host mixing — the bottleneck the reference calls out
(README.md:13-14).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchLoader:
    """Yields device-put batches produced ahead by background threads.

    Pass either a single iterator (one producer thread) or a ``factory``
    ``seed_index -> iterator`` for several independent producer threads
    (each gets its own synthesizer state, mirroring the reference's
    per-worker seeding, train.py:156).
    """

    def __init__(self, it=None, factory: Optional[Callable[[int], Iterator]] = None,
                 prefetch: int = 4, num_threads: int = 1,
                 device=None, sharding=None):
        if (it is None) == (factory is None):
            raise ValueError("pass exactly one of it= or factory=")
        if factory is None and num_threads > 1:
            raise ValueError("multiple threads need factory= (independent "
                             "iterator states)")
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.device = device
        self.sharding = sharding
        self._stop = threading.Event()
        self.threads = []
        iterators = ([it] if factory is None
                     else [factory(i) for i in range(num_threads)])
        for producer_it in iterators:
            t = threading.Thread(target=self._producer, args=(producer_it,),
                                 daemon=True)
            t.start()
            self.threads.append(t)

    def _producer(self, it):
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                while not self._stop.is_set():
                    try:
                        self.queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
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
