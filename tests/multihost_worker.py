"""Worker process for the multi-host detect test.

Launched N times by tests/test_multihost_detect.py with a shared
coordinator port; each instance initializes jax.distributed on the CPU
backend (the same fake-mesh strategy the suite uses for multi-chip,
extended to multi-PROCESS — SURVEY.md §4), runs `run_detect_loop` over its
record shard, and dumps the gathered (global) results to
``results_<pid>.pkl`` for the parent to verify.

Usage: python multihost_worker.py <port> <process_id> <num_processes> <workdir>
(the parent sets XLA_FLAGS to pick the per-process device count).
"""

import pickle
import sys


def main() -> int:
    port, pid, nprocs, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    # Must run before distributed init; env JAX_PLATFORMS is too late here
    # because the axon sitecustomize registers platforms at startup.
    jax.config.update("jax_platforms", "cpu")
    from multibox_tpu.cli.common import setup_jax_cache

    setup_jax_cache()
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs

    from multibox_tpu import priors as priors_mod
    from multibox_tpu.config import parse_config_file
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.inference import build_model, run_detect_loop
    from multibox_tpu.train.state import create_train_state

    cfg = parse_config_file(f"{workdir}/config.yaml")
    priors = priors_mod.load_priors(f"{workdir}/priors.pkl")
    cfg.num_priors = priors.shape[0]

    model = build_model(cfg, priors.shape[0])
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), priors.shape[0]
    )
    dataset = DetectionDataset(
        [f"{workdir}/data.tfrecord"],
        batch_size=cfg.batch_size,
        canvas_size=cfg.input_size,
        max_num_bboxes=cfg.max_num_bboxes,
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
    )
    results = run_detect_loop(
        cfg, state.detect_variables(), dataset, priors
    )
    with open(f"{workdir}/results_{pid}.pkl", "wb") as f:
        pickle.dump(results, f)

    # Same session, raw-FILE input (multibox-detect --images): shard the
    # file list per process, detect, and all-gather the per-shard source-
    # size maps exactly as cli/detect.py does for --coco_json.
    import glob

    img_paths = sorted(glob.glob(f"{workdir}/rawimg_*.jpg"))
    if img_paths:
        from multibox_tpu.data.pipeline import ImageFileDataset
        from multibox_tpu.parallel.gather import process_allgather_objects

        img_ds = ImageFileDataset(
            img_paths, batch_size=cfg.batch_size,
            canvas_size=cfg.input_size,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
        img_results = run_detect_loop(
            cfg, state.detect_variables(), img_ds, priors
        )
        merged_sizes = {}
        for shard_sizes in process_allgather_objects(img_ds.sizes):
            merged_sizes.update(shard_sizes)
        with open(f"{workdir}/img_results_{pid}.pkl", "wb") as f:
            pickle.dump({"results": img_results, "sizes": merged_sizes}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
