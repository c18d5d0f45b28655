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

import numpy as np


def burn_boxes(images: np.ndarray, boxes: np.ndarray, nums: np.ndarray) -> np.ndarray:
    """Burn 1-px green gt rectangles into uint8 canvases.

    images ``[N, H, W, 3]`` uint8, boxes ``[N, G, 4]`` normalized
    (ymin, xmin, ymax, xmax), nums ``[N]`` valid counts. Host-side numpy —
    used for TensorBoard input-image summaries (SURVEY.md §5.5), so it
    must not require matplotlib or a device round-trip.
    """
    out = np.array(images, copy=True)
    H, W = out.shape[1], out.shape[2]
    green = np.array([0, 255, 0], out.dtype)
    for i in range(out.shape[0]):
        for b in np.asarray(boxes[i, : int(nums[i])]):
            y0, y1 = sorted(
                int(round(float(v) * (H - 1))) for v in (b[0], b[2])
            )
            x0, x1 = sorted(
                int(round(float(v) * (W - 1))) for v in (b[1], b[3])
            )
            y0, y1 = max(0, y0), min(H - 1, y1)
            x0, x1 = max(0, x0), min(W - 1, x1)
            out[i, y0 : y1 + 1, (x0, x1)] = green
            out[i, (y0, y1), x0 : x1 + 1] = green
    return out


class MetricsWriter:
    def __init__(self, logdir: str, also_tensorboard: bool = True,
                 enabled: bool = True):
        """``enabled=False`` turns every method into a no-op (and opens no
        files) — multi-host runs construct the writer on every process but
        only process 0 may write, or N processes would interleave appends
        into the same metrics.jsonl on a shared logdir."""
        self._enabled = enabled
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if also_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if not self._enabled:
            return
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

    def write_images(
        self,
        step: int,
        images: np.ndarray,
        boxes: Optional[np.ndarray] = None,
        nums: Optional[np.ndarray] = None,
        tag: str = "inputs",
        max_images: int = 4,
    ) -> None:
        """TensorBoard image summary of input canvases with gt boxes
        burned in (the reference logged input images alongside scalars —
        SURVEY.md §5.5). No-op without TF. Deviation note: the reference
        logged post-augmentation crops; augmentation here runs ON DEVICE
        inside the jitted step, so these are the host-side input canvases
        (shipping augmented images back would cost a device transfer per
        summary — see the link discipline in train/loop.py); the
        augmented view is available via ``multibox-visualize-inputs``."""
        if self._tb is None:
            return
        import tensorflow as tf

        imgs = np.asarray(images[:max_images])
        if imgs.dtype != np.uint8:
            imgs = np.clip(imgs, 0, 255).astype(np.uint8)
        if boxes is not None and nums is not None:
            imgs = burn_boxes(imgs, boxes[:max_images], nums[:max_images])
        with self._tb.as_default():
            tf.summary.image(tag, imgs, step=int(step), max_outputs=max_images)
        self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
