"""multibox-eval — score detections against tfrecord ground truth.

ref:eval.py equivalent (SURVEY.md §2 C10); reports AP@0.5, AP@0.75,
COCO mAP@[.5:.95] and recall. Accepts either a detections file from
multibox-detect or a checkpoint to run detection inline.
"""

from __future__ import annotations

import argparse
import json
import pickle

import numpy as np

from multibox_tpu import priors as priors_mod
from multibox_tpu.cli.common import (
    add_config_arg,
    expand_tfrecords,
    load_config,
    setup_logging,
)
from multibox_tpu.data.example_proto import parse_detection_example
from multibox_tpu.data.tfrecord import read_records
from multibox_tpu.evaluate import evaluate_detections


def load_groundtruth(tfrecords, with_labels: bool = False,
                     label_offset: int = 0):
    """image_id → gt boxes (and labels). ``label_offset`` is subtracted
    from raw labels so they align with model class ids (cfg.label_offset —
    1-based datasets must be shifted the same way here as in training)."""
    gt = {}
    labels = {}
    for rec in read_records(tfrecords):
        ex = parse_detection_example(rec)
        gt[ex["image_id"]] = np.asarray(ex["boxes"], np.float64)
        labels[ex["image_id"]] = np.asarray(ex["labels"], np.int64) - label_offset
    return (gt, labels) if with_labels else gt


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tfrecords", nargs="+", required=True,
                        help="eval tfrecords (ground truth)")
    parser.add_argument("--detections", default=None,
                        help="detections .pkl/.json from multibox-detect")
    parser.add_argument("--checkpoint_path", default=None,
                        help="or: run detection inline from this checkpoint")
    parser.add_argument("--priors", default=None)
    parser.add_argument("--per_class", action="store_true",
                        help="multi-class protocol: AP per class, averaged")
    add_config_arg(parser)
    args = parser.parse_args(argv)
    setup_logging()

    tfrecords = expand_tfrecords(args.tfrecords)
    if args.detections:
        if args.detections.endswith(".json"):
            with open(args.detections) as f:
                results = json.load(f)
        else:
            with open(args.detections, "rb") as f:
                results = pickle.load(f)
    else:
        if not (args.checkpoint_path and args.priors):
            raise SystemExit("need --detections or (--checkpoint_path and --priors)")
        from multibox_tpu.cli.detect import run_detection

        cfg = load_config(args)
        priors = priors_mod.load_priors(args.priors)
        cfg.num_priors = priors.shape[0]
        results = run_detection(cfg, tfrecords, priors, args.checkpoint_path)

    if args.per_class:
        from multibox_tpu.evaluate import evaluate_detections_per_class

        gt, gt_labels = load_groundtruth(
            tfrecords, with_labels=True,
            label_offset=load_config(args).label_offset,
        )
        metrics = evaluate_detections_per_class(results, gt, gt_labels)
    else:
        gt = load_groundtruth(tfrecords)
        metrics = evaluate_detections(results, gt)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
