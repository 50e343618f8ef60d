"""Metric logging: JSONL always, TensorBoard when available.

The reference logs scalars to TensorBoard only (train.py:26). A JSONL
sidecar makes metrics greppable and keeps the framework dependency-light
in headless environments.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricWriter:
    def __init__(self, log_dir: str | Path, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step),
                        "time": time.time()}) + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, metrics: dict, step: int, prefix: str = ""):
        for k, v in metrics.items():
            self.scalar(prefix + k, v, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
