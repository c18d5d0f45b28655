"""mAP evaluation vs hand-computed cases."""

import numpy as np
import pytest

from multibox_tpu.evaluate import (
    average_precision,
    evaluate_detections,
    match_detections,
)


def test_match_detections_greedy():
    gt = np.array([[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]])
    det = np.array(
        [
            [0.0, 0.0, 0.5, 0.5],  # perfect on gt0
            [0.01, 0.01, 0.5, 0.5],  # dup of gt0 -> FP
            [0.5, 0.5, 1.0, 1.0],  # perfect on gt1
        ]
    )
    scores = np.array([0.9, 0.8, 0.7])
    tp = match_detections(det, scores, gt, 0.5)
    assert tp.tolist() == [True, False, True]


def test_perfect_detector_ap1():
    gt = {"a": np.array([[0.1, 0.1, 0.4, 0.4]]), "b": np.array([[0.5, 0.5, 0.9, 0.9]])}
    dets = [
        {"image_id": "a", "boxes": gt["a"], "scores": np.array([0.9])},
        {"image_id": "b", "boxes": gt["b"], "scores": np.array([0.8])},
    ]
    ap, recall = average_precision(dets, gt, 0.5)
    assert ap == pytest.approx(1.0)
    assert recall == pytest.approx(1.0)
    summary = evaluate_detections(dets, gt)
    assert summary["AP@0.5"] == pytest.approx(1.0)
    assert summary["mAP@[.5:.95]"] == pytest.approx(1.0)


def test_half_recall():
    gt = {"a": np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]])}
    dets = [
        {"image_id": "a", "boxes": np.array([[0.1, 0.1, 0.4, 0.4]]),
         "scores": np.array([0.9])}
    ]
    ap, recall = average_precision(dets, gt, 0.5)
    assert recall == pytest.approx(0.5)
    assert ap == pytest.approx(0.5)  # precision 1 up to recall .5, then 0


def test_false_positive_lowers_precision():
    gt = {"a": np.array([[0.1, 0.1, 0.4, 0.4]])}
    dets = [
        {"image_id": "a",
         "boxes": np.array([[0.6, 0.6, 0.9, 0.9], [0.1, 0.1, 0.4, 0.4]]),
         "scores": np.array([0.95, 0.9])}  # FP ranked above TP
    ]
    ap, _ = average_precision(dets, gt, 0.5)
    assert ap == pytest.approx(0.5)


def test_empty_everything():
    assert average_precision([], {}, 0.5) == (0.0, 0.0)
    gt = {"a": np.zeros((0, 4))}
    dets = [{"image_id": "a", "boxes": np.zeros((0, 4)), "scores": np.zeros(0)}]
    ap, recall = average_precision(dets, gt, 0.5)
    assert ap == 0.0 and recall == 0.0


def test_localization_quality_affects_strict_iou():
    gt = {"a": np.array([[0.0, 0.0, 0.5, 0.5]])}
    # 10% shifted box: IoU ~0.68 -> TP@0.5, FP@0.75
    dets = [{"image_id": "a", "boxes": np.array([[0.05, 0.05, 0.55, 0.55]]),
             "scores": np.array([0.9])}]
    summary = evaluate_detections(dets, gt)
    assert summary["AP@0.5"] == pytest.approx(1.0)
    assert summary["AP@0.75"] == pytest.approx(0.0)
    assert 0.0 < summary["mAP@[.5:.95]"] < 1.0
