"""Metrics: host-side scalar logging without touching the hot path.

The reference "logs" by per-step print statements (a debug print lives
inside the drag kernel, kinematics.py:37) and unbounded np.append histories
in PID (components.py:45-51). Here metrics come OUT of jitted programs as
returned arrays; this logger only aggregates and persists them host-side
(JSONL + optional TensorBoard when available).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, print_every: int = 0):
        self.log_dir = Path(log_dir) if log_dir else None
        self.print_every = print_every
        self._file = None
        self._tb = None
        self._n = 0
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._file = open(self.log_dir / "metrics.jsonl", "a")
            try:  # TensorBoard optional
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict) -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            v = np.asarray(v)
            record[k] = float(v) if v.ndim == 0 else v.mean().item()
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb:
            for k, v in record.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)
        self._n += 1
        if self.print_every and self._n % self.print_every == 0:
            shown = {k: round(v, 5) for k, v in record.items()
                     if k not in ("time",)}
            print(shown)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
