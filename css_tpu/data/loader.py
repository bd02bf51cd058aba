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
                 device=None, sharding=None, group: int = 1):
        if (it is None) == (factory is None):
            raise ValueError("pass exactly one of it= or factory=")
        if factory is None and num_threads > 1:
            raise ValueError("multiple threads need factory= (independent "
                             "iterator states)")
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.device = device
        self.sharding = sharding
        # emit `group` consecutive same-window-shape batches so the
        # consumer's multi-step dispatch (Trainer._stack_group) can stack
        # them: producer threads interleave nondeterministically, so
        # without regrouping a group of G consecutive batches rarely
        # shares one shape even when every producer holds its bucket for
        # G draws. Best-effort: bounded buffering, falls back gracefully.
        self.group = max(int(group), 1)
        self._pending: dict = {}
        self._current_key = None
        self._current_left = 0
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

    def _get(self):
        item = self.queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    @staticmethod
    def _shape_key(batch):
        for k in ("mix", "dm_winmark"):
            if isinstance(batch, dict) and k in batch:
                return batch[k].shape[-1]
        return None

    def _get_grouped(self):
        # serve the current group from the matching buffer first
        if self._current_left > 0:
            buf = self._pending.get(self._current_key)
            if buf:
                self._current_left -= 1
                return buf.pop(0)
            # pull until the current shape arrives (bounded buffering)
            cap = 2 * self.group
            while sum(map(len, self._pending.values())) < cap:
                b = self._get()
                k = self._shape_key(b)
                if k == self._current_key:
                    self._current_left -= 1
                    return b
                self._pending.setdefault(k, []).append(b)
            self._current_left = 0  # give up on this group (best-effort)
        # start a new group from the deepest backlog, else a fresh pull
        if any(self._pending.values()):
            self._current_key = max(self._pending,
                                    key=lambda k: len(self._pending[k]))
        else:
            b = self._get()
            self._current_key = self._shape_key(b)
            self._pending.setdefault(self._current_key, []).append(b)
        self._current_left = self.group - 1
        return self._pending[self._current_key].pop(0)

    def __next__(self):
        item = self._get_grouped() if self.group > 1 else self._get()
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
