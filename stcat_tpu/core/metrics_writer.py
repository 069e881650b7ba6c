"""Training-scalar sink: JSONL always, TensorBoard when available.

ref: scripts/train_net.py:79-82,152-154 writes TB scalars every 50 iters.
TensorBoard needs an event-writer backend (tensorflow / tensorboardX); this
environment has neither guaranteed, so scalars always land in
OUTPUT_DIR/metrics.jsonl (one JSON object per log step) and additionally in
TB events when a writer is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, out_dir: str, tb_dir: Optional[str] = None):
        os.makedirs(out_dir, exist_ok=True)
        self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tb_dir:
            try:
                from flax.metrics import tensorboard  # needs tf backend

                self._tb = tensorboard.SummaryWriter(tb_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
