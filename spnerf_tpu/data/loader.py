"""Minimal host-side batch loader with background prefetch.

Replaces torch DataLoader (reference utils/data_loaders.py). The
reference ran with ``num_workers=0`` (fully synchronous __getitem__ on
the training thread); here a daemon thread assembles numpy batches ahead
of the training loop so host data work overlaps device steps.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack a list of same-keyed dict samples into batched numpy arrays."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], dict):
            out[k] = collate(vals)
        else:
            out[k] = np.stack(vals)
    return out


class DataLoader:
    """Shuffling, batching, optional infinite cycling, thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        infinite: bool = False,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.infinite = infinite
        self.num_workers = num_workers

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_stream(self):
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(idx)
            n = len(idx)
            stop = n - self.batch_size + 1 if self.drop_last else n
            for s in range(0, max(stop, 0), self.batch_size):
                yield idx[s : s + self.batch_size]
            epoch += 1
            if not self.infinite:
                return

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        closed = threading.Event()

        def put(item) -> bool:
            # bounded-poll put so generator .close() can terminate the
            # worker instead of leaving it blocked forever on a full queue
            while not closed.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def load_batch(batch_idx):
            if self.num_workers > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    samples = list(pool.map(
                        lambda i: self.dataset[int(i)], batch_idx
                    ))
            else:
                samples = [self.dataset[int(i)] for i in batch_idx]
            return collate(samples)

        def worker():
            try:
                for batch_idx in self._index_stream():
                    if not put(load_batch(batch_idx)):
                        return
                put(stop)
            except BaseException as e:  # propagate into the consumer
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            closed.set()
