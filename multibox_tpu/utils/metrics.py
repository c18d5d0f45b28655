"""Metrics writer: TensorBoard events when TF is available, JSONL always.

The reference logged scalar summaries + input images to TensorBoard
(SURVEY.md §5.1/§5.5); scalar names are kept recognizable (loss,
loss_conf, loss_loc, learning_rate).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, logdir: str, also_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if also_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
