"""Rank-aware logging and windowed training meters.

ref: utils/logger.py (file+stdout logger on rank 0) and utils/metric_logger.py
(SmoothedValue / MetricLogger with median/avg/global_avg windows).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import defaultdict, deque
from typing import Dict


def setup_logger(name: str, save_dir: str = "", rank: int = 0,
                 stream=None) -> logging.Logger:
    """stream overrides the console sink (default stdout); cli.infer logs to
    stderr so its stdout stays machine-readable JSON."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        if stream is not None:
            # honor an explicit stream even on an already-configured logger:
            # cli.infer's stdout-stays-JSON guarantee must hold when e.g.
            # train() configured this logger to stdout earlier in-process
            for h in logger.handlers:
                if isinstance(h, logging.StreamHandler) and not isinstance(
                    h, logging.FileHandler
                ):
                    h.setStream(stream)
        return logger
    if rank > 0:
        logger.addHandler(logging.NullHandler())
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(stream=stream if stream is not None else sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SmoothedValue:
    """Track a window of values + global statistics. ref metric_logger.py:8-69."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float) -> None:
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    """ref metric_logger.py:72-104."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})"
            for name, m in self.meters.items()
        )


class Timer:
    """Wall-clock meter for data/step times (ref train_net.py:101,145-147)."""

    def __init__(self):
        self.t = time.time()

    def tick(self) -> float:
        now = time.time()
        dt = now - self.t
        self.t = now
        return dt
