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


def run_detection(cfg, tfrecords, priors, checkpoint_path, score_threshold=None):
    """Shared by detect / eval / visualize: returns a list of per-image
    detection dicts (only valid slots, host numpy)."""
    import jax.numpy as jnp

    from multibox_tpu.data.augment import preprocess_eval
    from multibox_tpu.data.pipeline import DetectionDataset, Prefetcher
    from multibox_tpu.inference import build_model, make_detect_fn
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.checkpoint import CheckpointManager

    model = build_model(cfg, priors.shape[0])
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), priors.shape[0])
    ckpt = CheckpointManager(checkpoint_path)
    state = ckpt.restore(state)
    variables = state.detect_variables()

    devices = jax.devices()
    if len(devices) > 1 and cfg.batch_size % len(devices) == 0:
        # Shard detection over the mesh (variables replicated, batch split);
        # the detect semantics come from the same body as the jitted path.
        from multibox_tpu.inference import make_detect_body
        from multibox_tpu.parallel.mesh import (
            make_mesh, make_parallel_detect_fn, replicated, shard_batch,
        )

        mesh = make_mesh(devices, cfg.data_axis)
        pdetect = make_parallel_detect_fn(
            make_detect_body(cfg, priors), mesh, cfg.data_axis
        )
        variables = jax.device_put(variables, replicated(mesh))

        def detect(v, images):
            return pdetect(v, shard_batch(images, mesh, cfg.data_axis))

    else:
        detect = make_detect_fn(cfg, priors)

    preprocess = jax.jit(
        lambda imgs: preprocess_eval(imgs, cfg.input_size)
    )

    dataset = DetectionDataset(
        tfrecords,
        batch_size=cfg.batch_size,
        canvas_size=cfg.input_size,
        max_num_bboxes=cfg.max_num_bboxes,
    )
    results = []
    thr = cfg.detect_score_threshold if score_threshold is None else score_threshold

    def drain(batch, det):
        boxes = np.asarray(det["boxes"])
        scores = np.asarray(det["scores"])
        classes = np.asarray(det["classes"])
        nums = np.asarray(det["num"])
        for i in range(int(batch["batch_valid"])):
            n = int(nums[i])
            keep = scores[i, :n] >= thr
            results.append(
                {
                    "image_id": batch["image_ids"][i],
                    "boxes": boxes[i, :n][keep],
                    "scores": scores[i, :n][keep],
                    "classes": classes[i, :n][keep],
                }
            )

    # 1-deep device pipeline: dispatch batch N+1's transfer+detect (async)
    # BEFORE draining batch N's outputs to the host, so the device works
    # while the host blocks on D2H — on a high-latency link the per-batch
    # round trips otherwise serialize.
    inflight = None
    for batch in Prefetcher(iter(dataset), depth=2):
        images = preprocess(jnp.asarray(batch["images"]))
        det = detect(variables, images)
        if inflight is not None:
            drain(*inflight)
        inflight = (batch, det)
    if inflight is not None:
        drain(*inflight)
    ckpt.close()
    return results


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tfrecords", nargs="+", required=True)
    parser.add_argument("--priors", required=True)
    parser.add_argument("--checkpoint_path", required=True,
                        help="logdir with orbax checkpoints")
    parser.add_argument("--output", required=True, help=".pkl or .json output")
    parser.add_argument("--score_threshold", type=float, default=None)
    add_config_arg(parser)
    args = parser.parse_args(argv)
    setup_logging()

    cfg = load_config(args)
    priors = priors_mod.load_priors(args.priors)
    cfg.num_priors = priors.shape[0]

    results = run_detection(
        cfg, expand_tfrecords(args.tfrecords), priors,
        args.checkpoint_path, args.score_threshold,
    )

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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
