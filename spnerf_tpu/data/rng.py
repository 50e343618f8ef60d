"""Thread-local RNG for datasets (safe under multi-worker loading)."""

from __future__ import annotations

import threading
import zlib

import numpy as np


def stable_seed(*parts) -> int:
    """Process-independent seed from strings/ints (unlike Python ``hash``,
    which is salted per process by PYTHONHASHSEED and breaks cross-run
    reproducibility of data augmentation)."""
    return zlib.crc32("/".join(str(p) for p in parts).encode()) % 2**31


class ThreadLocalRNG:
    """Per-thread numpy Generators seeded from a base seed + thread index.

    Dataset ``__getitem__`` may run concurrently in loader worker threads
    (data/loader.py num_workers); a shared Generator is not thread-safe.
    """

    def __init__(self, base_seed: int):
        self._base = int(base_seed) % 2**31
        self._tls = threading.local()
        self._lock = threading.Lock()
        self._next_stream = 0

    def get(self) -> np.random.Generator:
        rng = getattr(self._tls, "rng", None)
        if rng is None:
            with self._lock:
                stream = self._next_stream
                self._next_stream += 1
            rng = np.random.default_rng((self._base, stream))
            self._tls.rng = rng
        return rng
