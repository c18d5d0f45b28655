"""multibox-detect — batched detection over tfrecords from a checkpoint.

The equivalent of ref:detect.py (SURVEY.md §3.2): restore checkpoint
(EMA shadows by default), run the jitted detect pipeline batch by batch,
write {image_id → boxes, scores, classes} to pickle or JSON.
"""

from __future__ import annotations

import argparse
import json
import pickle

import jax
import numpy as np

from multibox_tpu import priors as priors_mod
from multibox_tpu.cli.common import (
    add_config_arg,
    expand_tfrecords,
    load_config,
    setup_logging,
)


def run_detection(cfg, tfrecords, priors, checkpoint_path,
                  score_threshold=None, dataset=None):
    """Shared by detect / eval / visualize: returns a list of per-image
    detection dicts (only valid slots, host numpy). The host loop itself —
    chunked transfers, 1-deep pipeline, mesh sharding — lives in
    ``inference.run_detect_loop``. ``dataset`` overrides the default
    tfrecord dataset (the ``--images`` raw-file path)."""
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.inference import build_model, run_detect_loop
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.checkpoint import CheckpointManager

    model = build_model(cfg, priors.shape[0])
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), priors.shape[0])
    ckpt = CheckpointManager(checkpoint_path)
    state = ckpt.restore(state)

    if dataset is None:
        # Multi-host: shard records per process (run_detect_loop runs the
        # local shard on local devices and all-gathers the results, so
        # every host still returns — and writes — the full result set).
        dataset = DetectionDataset(
            tfrecords,
            batch_size=cfg.batch_size,
            canvas_size=cfg.input_size,
            max_num_bboxes=cfg.max_num_bboxes,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
    variables = state.detect_variables()
    if cfg.quantize != "none":
        # Bake EMA+BN+int8 into the variables, calibrating activation
        # scales on this run's own first batches (the dataset re-iterates
        # from the start for the real pass below). Multi-host: each
        # process calibrates on its own record shard — scales may differ
        # slightly across hosts, but every image is still detected by
        # exactly one calibrated program.
        from multibox_tpu.quantize import (
            calib_batches_from_dataset,
            prepare_quantized_variables,
        )

        variables = prepare_quantized_variables(
            cfg,
            variables,
            calib_batches_from_dataset(dataset, cfg.quant_calib_batches),
        )
    results = run_detect_loop(
        cfg, variables, dataset, priors,
        score_threshold=score_threshold,
    )
    ckpt.close()
    return results


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tfrecords", nargs="+", default=None)
    parser.add_argument("--images", nargs="+", default=None,
                        help="raw image files/globs (JPEG/PNG/...) instead "
                             "of tfrecords")
    parser.add_argument("--priors", required=True)
    parser.add_argument("--checkpoint_path", required=True,
                        help="logdir with orbax checkpoints")
    parser.add_argument("--output", required=True, help=".pkl or .json output")
    parser.add_argument("--coco_json", default=None,
                        help="also write a COCO results-format JSON "
                             "(pixel [x,y,w,h]; needs image/height+width "
                             "features in the tfrecords)")
    parser.add_argument("--score_threshold", type=float, default=None)
    add_config_arg(parser)
    args = parser.parse_args(argv)
    setup_logging()

    if bool(args.tfrecords) == bool(args.images):
        raise SystemExit("need exactly one of --tfrecords / --images")
    cfg = load_config(args)
    priors = priors_mod.load_priors(args.priors)
    cfg.num_priors = priors.shape[0]

    image_dataset = None
    if args.images:
        import glob as globmod

        from multibox_tpu.data.pipeline import ImageFileDataset

        paths = []
        for p in args.images:
            matched = sorted(globmod.glob(p))
            paths.extend(matched if matched else [p])
        # Multi-host: shard the file list across processes (same
        # round-robin rule as tfrecord detect); the result lists merge
        # inside run_detect_loop's all-gather. Glob order is sorted, so
        # every process derives the same global list to shard.
        image_dataset = ImageFileDataset(
            paths, batch_size=cfg.batch_size, canvas_size=cfg.input_size,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )

    results = run_detection(
        cfg,
        expand_tfrecords(args.tfrecords) if args.tfrecords else None,
        priors, args.checkpoint_path, args.score_threshold,
        dataset=image_dataset,
    )

    if image_dataset is not None and jax.process_count() > 1:
        # Each process's ImageFileDataset recorded source sizes only for
        # its own shard; --coco_json needs them for the full set. This is
        # a COLLECTIVE, so it must run on every process, before the
        # process-0 write gate below.
        from multibox_tpu.parallel.gather import process_allgather_objects

        merged = {}
        for shard_sizes in process_allgather_objects(image_dataset.sizes):
            merged.update(shard_sizes)
        image_dataset.sizes = merged

    if jax.process_index() != 0:
        # Multi-host: every process holds the full gathered result list,
        # but only process 0 writes — N processes truncating + writing the
        # same --output path on a shared filesystem (the common pod setup)
        # can interleave and corrupt it even though the content matches.
        return 0

    if args.output.endswith(".json"):
        payload = [
            {
                "image_id": r["image_id"],
                "boxes": np.asarray(r["boxes"]).tolist(),
                "scores": np.asarray(r["scores"]).tolist(),
                "classes": np.asarray(r["classes"]).tolist(),
            }
            for r in results
        ]
        with open(args.output, "w") as f:
            json.dump(payload, f)
    else:
        with open(args.output, "wb") as f:
            pickle.dump(results, f)
    print(f"wrote {len(results)} image results to {args.output}")

    if args.coco_json:
        from multibox_tpu.evaluate import to_coco_results

        if image_dataset is not None:
            sizes = image_dataset.sizes  # recorded during iteration
        else:
            from multibox_tpu.cli.evaluate import load_groundtruth

            _, sizes = load_groundtruth(
                expand_tfrecords(args.tfrecords), with_sizes=True
            )
        coco = to_coco_results(results, sizes, label_offset=cfg.label_offset)
        with open(args.coco_json, "w") as f:
            json.dump(coco, f)
        print(f"wrote {len(coco)} COCO-format detections to {args.coco_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
