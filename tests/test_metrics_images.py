"""Input-image TensorBoard summaries (SURVEY.md §5.5 — the reference
logged input images alongside scalar summaries)."""

import glob
import os

import numpy as np

from multibox_tpu.utils.metrics import MetricsWriter, burn_boxes


def test_burn_boxes_draws_perimeter():
    imgs = np.zeros((1, 20, 20, 3), np.uint8)
    boxes = np.array([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    out = burn_boxes(imgs, boxes, np.array([1]))
    y0 = x0 = round(0.25 * 19)
    y1 = x1 = round(0.75 * 19)
    green = [0, 255, 0]
    assert out[0, y0, x0].tolist() == green
    assert out[0, y1, x1].tolist() == green
    assert out[0, y0, (x0 + x1) // 2].tolist() == green  # top edge
    assert out[0, (y0 + y1) // 2, x0].tolist() == green  # left edge
    # interior untouched
    assert out[0, (y0 + y1) // 2, (x0 + x1) // 2].tolist() == [0, 0, 0]
    # padded gt rows ignored
    out2 = burn_boxes(imgs, boxes, np.array([0]))
    assert out2.sum() == 0


def test_burn_boxes_clips_out_of_range():
    imgs = np.zeros((1, 10, 10, 3), np.uint8)
    boxes = np.array([[[-0.5, -0.5, 1.5, 1.5]]], np.float32)
    out = burn_boxes(imgs, boxes, np.array([1]))  # must not raise
    assert out[0, 0, 0].tolist() == [0, 255, 0]
    assert out[0, 9, 9].tolist() == [0, 255, 0]


def test_write_images_emits_event(tmp_path):
    logdir = str(tmp_path / "tb")
    w = MetricsWriter(logdir)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3)).astype(
        np.uint8
    )
    boxes = np.tile(
        np.array([[0.2, 0.2, 0.8, 0.8]], np.float32)[None], (2, 1, 1)
    )
    w.write_images(3, imgs, boxes, np.array([1, 1]))
    w.write(3, {"loss": 1.0})
    w.close()
    try:
        import tensorflow  # noqa: F401
    except Exception:
        return  # no TB backend: write_images must just not crash
    events = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 100
