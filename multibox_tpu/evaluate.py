"""Detection evaluation: precision/recall + AP/mAP.

The reference's eval scored detections against ground truth at IoU ≥ 0.5
(ref:eval.py, SURVEY.md §2 C10); BASELINE.json asks for "mAP parity", so
this module implements the standard protocols:

* :func:`average_precision` — VOC-style AP for one class/threshold with
  greedy matching of detections (score-descending) to gt, all-point
  interpolation (area under the PR curve).
* :func:`evaluate_detections` — dataset-level: AP@0.5, AP@0.75, and
  COCO-style mAP averaged over IoU ∈ {0.5, 0.55, …, 0.95}, plus recall.

Host-side numpy (eval is not a hot path; detections arrive as small arrays
from the on-device pipeline).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _iou_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    ay0, ax0, ay1, ax1 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    by0, bx0, by1, bx1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    ih = np.maximum(0.0, np.minimum(ay1, by1) - np.maximum(ay0, by0))
    iw = np.maximum(0.0, np.minimum(ax1, bx1) - np.maximum(ax0, bx0))
    inter = ih * iw
    area_a = np.maximum(0.0, ay1 - ay0) * np.maximum(0.0, ax1 - ax0)
    area_b = np.maximum(0.0, by1 - by0) * np.maximum(0.0, bx1 - bx0)
    union = area_a + area_b - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def match_detections(
    det_boxes: np.ndarray,
    det_scores: np.ndarray,
    gt_boxes: np.ndarray,
    iou_threshold: float,
) -> np.ndarray:
    """Greedy TP/FP assignment for one image.

    Detections in score-descending order claim the best unclaimed gt with
    IoU ≥ threshold (the VOC/COCO protocol). Returns bool TP mask aligned
    with the (sorted) detections.
    """
    order = np.argsort(-det_scores, kind="stable")
    det_boxes = det_boxes[order]
    iou = _iou_matrix_np(det_boxes, gt_boxes)
    claimed = np.zeros(len(gt_boxes), bool)
    tp = np.zeros(len(det_boxes), bool)
    for d in range(len(det_boxes)):
        if len(gt_boxes) == 0:
            break
        candidates = np.where(~claimed, iou[d], -1.0)
        best = int(np.argmax(candidates))
        if candidates[best] >= iou_threshold:
            claimed[best] = True
            tp[d] = True
    return tp


def average_precision(
    detections: Sequence[Dict],
    groundtruth: Dict[str, np.ndarray],
    iou_threshold: float = 0.5,
) -> Tuple[float, float]:
    """(AP, recall) over a dataset at one IoU threshold.

    Args:
      detections: list of {image_id, boxes [K,4], scores [K]}.
      groundtruth: image_id → gt boxes [N, 4].
    """
    total_gt = int(sum(len(b) for b in groundtruth.values()))
    scores_all: List[np.ndarray] = []
    tp_all: List[np.ndarray] = []
    for det in detections:
        boxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)
        scores = np.asarray(det["scores"], np.float64).reshape(-1)
        gt = np.asarray(
            groundtruth.get(det["image_id"], np.zeros((0, 4))), np.float64
        ).reshape(-1, 4)
        tp = match_detections(boxes, scores, gt, iou_threshold)
        order = np.argsort(-scores, kind="stable")
        scores_all.append(scores[order])
        tp_all.append(tp)
    if total_gt == 0:
        return 0.0, 0.0
    if not scores_all:
        return 0.0, 0.0
    scores_cat = np.concatenate(scores_all)
    tp_cat = np.concatenate(tp_all)
    order = np.argsort(-scores_cat, kind="stable")
    tp_sorted = tp_cat[order]

    cum_tp = np.cumsum(tp_sorted)
    cum_fp = np.cumsum(~tp_sorted)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)

    # All-point interpolation (monotone precision envelope).
    mprec = np.concatenate([[0.0], precision, [0.0]])
    mrec = np.concatenate([[0.0], recall, [1.0]])
    for i in range(len(mprec) - 2, -1, -1):
        mprec[i] = max(mprec[i], mprec[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    ap = float(np.sum((mrec[idx + 1] - mrec[idx]) * mprec[idx + 1]))
    final_recall = float(recall[-1]) if len(recall) else 0.0
    return ap, final_recall


def evaluate_detections(
    detections: Sequence[Dict],
    groundtruth: Dict[str, np.ndarray],
) -> Dict[str, float]:
    """Standard summary: AP@.5, AP@.75, COCO mAP@[.5:.95:.05], recall@.5."""
    ap50, rec50 = average_precision(detections, groundtruth, 0.5)
    ap75, _ = average_precision(detections, groundtruth, 0.75)
    aps = [
        average_precision(detections, groundtruth, t)[0]
        for t in np.arange(0.5, 1.0, 0.05)
    ]
    return {
        "AP@0.5": ap50,
        "AP@0.75": ap75,
        "mAP@[.5:.95]": float(np.mean(aps)),
        "recall@0.5": rec50,
        "num_images": float(len(detections)),
        "num_gt": float(sum(len(b) for b in groundtruth.values())),
    }


def evaluate_detections_per_class(
    detections: Sequence[Dict],
    groundtruth_boxes: Dict[str, np.ndarray],
    groundtruth_labels: Dict[str, np.ndarray],
) -> Dict[str, float]:
    """Multi-class protocol: AP computed per class, averaged (VOC/COCO).

    Detections must carry ``classes``; ground truth labels per image are
    aligned with the gt boxes. Classes absent from the ground truth are
    skipped (COCO convention).
    """
    classes = sorted(
        {int(c) for labels in groundtruth_labels.values() for c in labels}
    )
    summary: Dict[str, float] = {}
    per_class_50 = []
    per_class_coco = []
    for c in classes:
        gt_c = {
            img: boxes[np.asarray(groundtruth_labels[img]) == c]
            for img, boxes in groundtruth_boxes.items()
        }
        det_c = []
        for det in detections:
            mask = np.asarray(det.get("classes", [])) == c
            det_c.append(
                {
                    "image_id": det["image_id"],
                    "boxes": np.asarray(det["boxes"]).reshape(-1, 4)[mask],
                    "scores": np.asarray(det["scores"]).reshape(-1)[mask],
                }
            )
        ap50, _ = average_precision(det_c, gt_c, 0.5)
        coco = float(
            np.mean(
                [average_precision(det_c, gt_c, t)[0]
                 for t in np.arange(0.5, 1.0, 0.05)]
            )
        )
        per_class_50.append(ap50)
        per_class_coco.append(coco)
        summary[f"AP@0.5/class_{c}"] = ap50
    summary["mAP@0.5"] = float(np.mean(per_class_50)) if per_class_50 else 0.0
    summary["mAP@[.5:.95]"] = (
        float(np.mean(per_class_coco)) if per_class_coco else 0.0
    )
    summary["num_classes"] = float(len(classes))
    return summary
