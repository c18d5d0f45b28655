"""mAP evaluation vs hand-computed cases."""

import numpy as np
import pytest

from multibox_tpu.evaluate import (
    average_precision,
    evaluate_detections,
    match_detections,
)

# Fast tier: no 8-device e2e state, runs in the `-m smoke` subset.
pytestmark = pytest.mark.smoke


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


# ---- size-stratified COCO eval (evaluate_detections_by_size) ----
#
# Geometry used below (image 100x100 px): a "small" object is a box of
# 0.2x0.04 normalized = 20x4 px = 80 px^2 < 32^2; a "large" object is
# 0.99x0.99 normalized = 9801 px^2 > 96^2.

def _sized_fixture():
    from multibox_tpu.evaluate import evaluate_detections_by_size

    small = [0.1, 0.1, 0.3, 0.14]     # 80 px^2  -> small band
    large = [0.0, 0.0, 0.99, 0.99]    # 9801 px^2 -> large band
    gt = {"a": np.array([small, large])}
    sizes = {"a": (100, 100)}
    return evaluate_detections_by_size, small, large, gt, sizes


def test_by_size_perfect_detections_split_into_bands():
    ev, small, large, gt, sizes = _sized_fixture()
    dets = [{"image_id": "a",
             "boxes": np.array([small, large]),
             "scores": np.array([0.9, 0.8])}]
    m = ev(dets, gt, sizes)
    assert m["AP@0.5/small"] == 1.0
    assert m["AP@0.5/large"] == 1.0
    assert m["AP@0.5/medium"] == 0.0 and m["num_gt/medium"] == 0.0
    assert m["num_gt/small"] == 1.0 and m["num_gt/large"] == 1.0
    assert m["num_images_skipped"] == 0.0


def test_by_size_out_of_band_detection_is_ignored_not_fp():
    """A detection matching an out-of-band gt must NOT poison the band's
    precision (cocoeval gtIg), and an unmatched out-of-band detection is
    dropped too (dtIg) — in both cases the small band keeps AP=1."""
    ev, small, large, gt, sizes = _sized_fixture()
    dets = [{"image_id": "a",
             # higher-scored large det first: would be an FP for the small
             # band under naive filtering
             "boxes": np.array([large, small]),
             "scores": np.array([0.95, 0.9])}]
    assert ev(dets, gt, sizes)["AP@0.5/small"] == 1.0
    # unmatched large detection (large gt removed): still not a small FP
    gt2 = {"a": np.array([small])}
    m = ev(dets, gt2, sizes)
    assert m["AP@0.5/small"] == 1.0
    # ...but an IN-band false positive does lower small AP
    dets_fp = [{"image_id": "a",
                "boxes": np.array([[0.5, 0.5, 0.7, 0.54], small]),
                "scores": np.array([0.95, 0.9])}]
    assert m["AP@0.5/small"] > ev(dets_fp, gt2, sizes)["AP@0.5/small"]


def test_by_size_band_depends_on_image_pixels():
    """The same normalized box lands in different bands as the source
    image grows: 0.2x0.2 of 100px = 400 px^2 (small) vs of 500px =
    10000 px^2 (large)."""
    from multibox_tpu.evaluate import evaluate_detections_by_size as ev

    box = [0.1, 0.1, 0.3, 0.3]
    dets = [{"image_id": "a", "boxes": np.array([box]),
             "scores": np.array([0.9])}]
    gt = {"a": np.array([box])}
    m_small_img = ev(dets, gt, {"a": (100, 100)})
    m_large_img = ev(dets, gt, {"a": (500, 500)})
    assert m_small_img["num_gt/small"] == 1.0
    assert m_large_img["num_gt/large"] == 1.0


def test_by_size_skips_images_without_size():
    ev, small, large, gt, sizes = _sized_fixture()
    dets = [{"image_id": "a", "boxes": np.array([small]),
             "scores": np.array([0.9])},
            {"image_id": "no-size", "boxes": np.array([small]),
             "scores": np.array([0.9])}]
    m = ev(dets, gt, sizes)
    assert m["num_images_skipped"] == 1.0
    assert m["AP@0.5/small"] == 1.0


def test_to_coco_results_round_trip():
    from multibox_tpu.evaluate import to_coco_results

    dets = [
        {"image_id": "17",
         "boxes": np.array([[0.1, 0.2, 0.5, 0.6]]),   # ymin xmin ymax xmax
         "scores": np.array([0.9]),
         "classes": np.array([2])},
        {"image_id": "no-size",
         "boxes": np.array([[0.0, 0.0, 1.0, 1.0]]),
         "scores": np.array([0.5]),
         "classes": np.array([0])},
    ]
    out = to_coco_results(dets, {"17": (200, 100)}, label_offset=1)
    assert len(out) == 1  # the size-less image is skipped
    r = out[0]
    assert r["image_id"] == 17  # numeric id -> int (COCO convention)
    assert r["category_id"] == 3  # 2 + label_offset 1
    # bbox = [x, y, w, h] in pixels of the 200x100 (h, w) image
    assert r["bbox"] == pytest.approx([0.2 * 100, 0.1 * 200,
                                       0.4 * 100, 0.4 * 200])
    assert r["score"] == pytest.approx(0.9)


def test_to_coco_results_clamps_inverted_corners():
    from multibox_tpu.evaluate import to_coco_results

    dets = [{"image_id": "1",
             "boxes": np.array([[0.5, 0.9, 0.2, 0.1]]),  # y1<y0, x1<x0
             "scores": np.array([0.3]), "classes": np.array([0])}]
    (r,) = to_coco_results(dets, {"1": (100, 100)})
    assert r["bbox"][2] == 0.0 and r["bbox"][3] == 0.0


def test_to_coco_results_string_id_and_default_classes():
    from multibox_tpu.evaluate import to_coco_results

    dets = [{"image_id": "img-3",
             "boxes": np.array([[0.0, 0.0, 0.5, 0.5]]),
             "scores": np.array([0.4])}]  # no "classes" key
    out = to_coco_results(dets, {"img-3": (80, 80)})
    assert out[0]["image_id"] == "img-3"
    assert out[0]["category_id"] == 0


def test_by_size_counts_gt_of_undetected_images():
    """An image with in-band gt but NO detection entry must count as
    missed gt (same convention as average_precision) — otherwise banded
    recall/AP are inflated relative to the headline rows."""
    from multibox_tpu.evaluate import evaluate_detections_by_size as ev

    small = [0.1, 0.1, 0.3, 0.14]  # 80 px^2 on a 100px image
    gt = {"a": np.array([small]), "b": np.array([small])}
    sizes = {"a": (100, 100), "b": (100, 100)}
    dets = [{"image_id": "a", "boxes": np.array([small]),
             "scores": np.array([0.9])}]  # image "b" never detected
    m = ev(dets, gt, sizes)
    assert m["num_gt/small"] == 2.0
    assert m["recall@0.5/small"] == pytest.approx(0.5)
    assert m["AP@0.5/small"] == pytest.approx(0.5)


def test_by_size_per_class_stratification():
    """With groundtruth_labels the bands run per class then average
    (cocoeval's actual protocol). Separating case: a detector that finds
    both objects but labels both class 0 — perfect in the agnostic view,
    half right per class."""
    from multibox_tpu.evaluate import evaluate_detections_by_size as ev

    small_a = [0.1, 0.1, 0.3, 0.14]
    small_b = [0.6, 0.6, 0.8, 0.64]
    gt = {"a": np.array([small_a, small_b])}
    labels = {"a": np.array([0, 1])}
    sizes = {"a": (100, 100)}
    # Detector finds both boxes but labels BOTH class 0.
    dets = [{"image_id": "a",
             "boxes": np.array([small_a, small_b]),
             "scores": np.array([0.9, 0.8]),
             "classes": np.array([0, 0])}]
    agnostic = ev(dets, gt, sizes)
    per_class = ev(dets, gt, sizes, groundtruth_labels=labels)
    # Class-agnostic: both detections match (labels ignored) -> AP 1.
    assert agnostic["AP@0.5/small"] == pytest.approx(1.0)
    # Per-class: class 0 has 1 gt + 2 dets (one FP), class 1 has 1 gt +
    # 0 dets -> AP(class 0) = 1.0 (TP ranked first), AP(class 1) = 0.
    assert per_class["AP@0.5/small"] == pytest.approx(0.5)
    assert per_class["num_gt/small"] == 2.0


def test_by_size_per_class_skips_classes_absent_from_band():
    """cocoeval excludes classes with no gt in a band (-1 entries) from
    the band average — a perfect detector must score 1.0 on the small
    band even when one class has no small objects."""
    from multibox_tpu.evaluate import evaluate_detections_by_size as ev

    small = [0.1, 0.1, 0.3, 0.14]     # 80 px^2 -> small on 100px image
    large = [0.0, 0.0, 0.99, 0.99]    # 9801 px^2 -> large
    gt = {"a": np.array([small, large])}
    labels = {"a": np.array([0, 1])}  # class 1 has NO small gt
    sizes = {"a": (100, 100)}
    dets = [{"image_id": "a", "boxes": np.array([small, large]),
             "scores": np.array([0.9, 0.8]), "classes": np.array([0, 1])}]
    m = ev(dets, gt, sizes, groundtruth_labels=labels)
    assert m["AP@0.5/small"] == pytest.approx(1.0)
    assert m["AP@0.5/large"] == pytest.approx(1.0)
    assert m["AP@0.5/medium"] == 0.0 and m["num_gt/medium"] == 0.0


def test_per_class_protocols_tolerate_classless_detections():
    """A class-agnostic detections file (no 'classes' key) must evaluate
    under the per-class protocols as class 0, not crash."""
    from multibox_tpu.evaluate import (
        evaluate_detections_by_size,
        evaluate_detections_per_class,
    )

    box = [0.1, 0.1, 0.3, 0.14]
    gt = {"a": np.array([box])}
    labels = {"a": np.array([0])}
    dets = [{"image_id": "a", "boxes": np.array([box]),
             "scores": np.array([0.9])}]  # no "classes"
    m1 = evaluate_detections_per_class(dets, gt, labels)
    assert m1["mAP@0.5"] == pytest.approx(1.0)
    m2 = evaluate_detections_by_size(
        dets, gt, {"a": (100, 100)}, groundtruth_labels=labels
    )
    assert m2["AP@0.5/small"] == pytest.approx(1.0)
    # image with gt boxes but missing labels entry: no gt for any class
    gt2 = {"a": np.array([box]), "orphan": np.array([box])}
    m3 = evaluate_detections_per_class(dets, gt2, labels)
    assert np.isfinite(m3["mAP@0.5"])


def test_average_recall_caps_detections():
    """AR@1 keeps only each image's top-scored detection (cocoeval's
    maxDets cap): with 2 gt and a perfect 2-detection answer, AR@1 = 0.5
    while AR@10 = 1.0."""
    from multibox_tpu.evaluate import average_recall

    gt = {"a": np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]])}
    dets = [{"image_id": "a", "boxes": gt["a"],
             "scores": np.array([0.9, 0.8])}]
    assert average_recall(dets, gt, 1) == pytest.approx(0.5)
    assert average_recall(dets, gt, 10) == pytest.approx(1.0)
    # the cap picks by SCORE: a junk top-scored box drops AR@1 to 0
    dets_bad = [{"image_id": "a",
                 "boxes": np.array([[0.0, 0.0, 0.05, 0.05],
                                    *gt["a"].tolist()]),
                 "scores": np.array([0.95, 0.9, 0.8])}]
    assert average_recall(dets_bad, gt, 1) == pytest.approx(0.0)
    m = __import__("multibox_tpu.evaluate", fromlist=["evaluate_detections"])
    summary = m.evaluate_detections(dets, gt)
    assert summary["AR@100"] == pytest.approx(1.0)
    assert summary["AR@1"] == pytest.approx(0.5)
