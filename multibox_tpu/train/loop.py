"""Full training loop: data → on-device augment → train step → ckpt/metrics.

The TPU-native equivalent of ref:train.py's Supervisor loop (SURVEY.md §3.1):

- resume-from-latest-checkpoint by default (Supervisor semantics, §5.3)
- optional pretrained-backbone restore (slim ckpt import or a saved state)
- ONE jitted XLA program per step containing augmentation, forward,
  matching, loss, backward, optimizer, EMA — no host round trips
- host decode threads + background prefetch keep the device fed
- scales to a device mesh via ``parallel`` (batch sharded on the data axis)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multibox_tpu.config import Config
from multibox_tpu.data import augment as augment_mod
from multibox_tpu.data.pipeline import DetectionDataset, Prefetcher
from multibox_tpu.inference import build_model
from multibox_tpu.parallel import (
    coordination_barrier,
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from multibox_tpu.train.state import TrainState, create_train_state, make_train_step
from multibox_tpu.utils.checkpoint import CheckpointManager
from multibox_tpu.utils.metrics import MetricsWriter

log = logging.getLogger(__name__)


def make_augmented_train_step(cfg: Config, model, priors):
    """Wrap the train step so augmentation runs inside the same XLA program.

    Batch in: raw uint8 canvas images + padded boxes. The augmentation key
    derives from the step counter — deterministic, resume-stable.
    """
    base_step = make_train_step(cfg, model, priors)

    def step(state: TrainState, batch):
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)
        labels = batch.get("labels")
        if cfg.augment:
            out = augment_mod.augment_batch(
                key, batch["images"], batch["boxes"], batch["num_boxes"], cfg,
                labels=labels,
            )
            if labels is not None:
                images, boxes, num_boxes, labels = out
            else:
                images, boxes, num_boxes = out
        else:
            images = augment_mod.preprocess_eval(batch["images"], cfg.input_size)
            boxes, num_boxes = batch["boxes"], batch["num_boxes"]
        device_batch = {"images": images, "boxes": boxes, "num_boxes": num_boxes}
        if labels is not None and cfg.num_classes > 1:
            device_batch["labels"] = labels
        return base_step(state, device_batch)

    return step


def make_chunked_step(step_fn, num_steps: int):
    """Run ``num_steps`` train steps over a stacked superbatch in ONE
    device call: ``lax.scan`` over the leading (chunk) axis. Amortizes the
    per-transfer/per-dispatch cost of high-latency device links
    (cfg.steps_per_host_transfer). Returns the LAST step's metrics."""

    def chunk_step(state, superbatch):
        def body(state, batch):
            return step_fn(state, batch)

        state, metrics = jax.lax.scan(body, state, superbatch)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return chunk_step


def eval_config(cfg: Config) -> Config:
    """Per-host detect/eval config derived from the TRAINING config.

    ``cfg.batch_size`` is the GLOBAL train batch (the train loop feeds
    ``batch_size // process_count()`` per host), but ``run_detect_loop``
    treats ``batch_size`` as PER-HOST. Evaluating with the global size on a
    multi-host pod would run each host's eval program at process_count× the
    per-host training batch (likely OOM at the first periodic eval). Scale
    it down to the per-host share, kept divisible by the local device count
    so the sharded detect program still partitions evenly."""
    local = max(1, len(jax.local_devices()))
    per_host = max(local, cfg.batch_size // jax.process_count())
    per_host -= per_host % local
    if per_host == cfg.batch_size:
        return cfg
    return dataclasses.replace(cfg, batch_size=per_host)


def make_eval_fns(cfg: Config, priors):
    """Build the jitted detect-loop programs for periodic eval once; the
    train loop holds them so repeated evals reuse the same traced functions
    instead of paying a fresh (remote) compile each time. ``cfg`` is the
    TRAINING config; the per-host eval adjustment (``eval_config``) is
    applied here so the traced shapes match ``evaluate_state``'s dataset."""
    from multibox_tpu.inference import make_detect_loop_fns

    return make_detect_loop_fns(eval_config(cfg), priors)


def evaluate_state(cfg: Config, state: TrainState, priors, eval_tfrecords,
                   eval_fns=None, gt=None):
    """Run detection + AP over a validation set from the current state.

    Ground truth is read directly from the tfrecords (full box lists) —
    NOT from the padded batch, which truncates to ``cfg.max_num_bboxes``
    and would silently shrink the AP/recall denominator on crowded images
    (and disagree with ``multibox-eval``, which also reads full gt).
    ``gt`` may be passed pre-loaded (the train loop caches it so periodic
    evals don't re-read + re-parse the whole val set every time) — either
    the boxes dict alone or a ``(boxes, labels)`` tuple; with labels and
    ``cfg.num_classes > 1`` the summary also carries the per-class
    protocol (``mAP@0.5``, per-class APs — the multi-class metric that
    exposed the round-2 plateau, which the class-agnostic AP@0.5 hid).
    """
    from multibox_tpu.cli.evaluate import load_groundtruth
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.evaluate import (
        evaluate_detections,
        evaluate_detections_per_class,
    )
    from multibox_tpu.inference import run_detect_loop

    cfg = eval_config(cfg)
    # Multi-host: each process evaluates its shard of the val records on
    # its local devices; run_detect_loop all-gathers the detections, so the
    # metrics computed here are global and identical on every host.
    dataset = DetectionDataset(
        eval_tfrecords,
        batch_size=cfg.batch_size,
        canvas_size=cfg.input_size,
        max_num_bboxes=cfg.max_num_bboxes,
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
    )
    gt_labels = None
    if gt is None:
        if cfg.num_classes > 1:
            gt, gt_labels = load_groundtruth(
                eval_tfrecords, with_labels=True, label_offset=cfg.label_offset
            )
        else:
            gt = load_groundtruth(eval_tfrecords)
    elif isinstance(gt, tuple):
        gt, gt_labels = gt
    results = run_detect_loop(
        cfg, state.detect_variables(), dataset, priors,
        fns=eval_fns or make_eval_fns(cfg, priors),
    )
    summary = evaluate_detections(results, gt)
    if cfg.num_classes > 1 and gt_labels is not None:
        per_class = evaluate_detections_per_class(results, gt, gt_labels)
        # The agnostic COCO mAP above keeps its key; the per-class COCO
        # average (cocoeval's actual protocol) gets its own.
        per_class["mAP@[.5:.95]/per_class"] = per_class.pop("mAP@[.5:.95]")
        summary.update(per_class)
    return summary


def train(
    cfg: Config,
    tfrecords: Sequence[str],
    priors: np.ndarray,
    logdir: str,
    pretrained_model: Optional[str] = None,
    max_steps: Optional[int] = None,
    use_mesh: bool = True,
    canvas_size: Optional[int] = None,
    eval_tfrecords: Optional[Sequence[str]] = None,
    eval_every_steps: int = 0,
    schedule_total: Optional[int] = None,
    shuffle: bool = True,
) -> TrainState:
    """Run training; returns the final state. Resumes from logdir if a
    checkpoint exists (reference Supervisor behavior).

    ``max_steps`` bounds THIS invocation; the LR schedule's horizon
    follows it (a cosine annealed over cfg's default 100k while the run
    stops at 5k would silently behave like constant LR). When one logical
    run spans several bounded invocations (the --restart_every_steps
    supervisor), ``schedule_total`` pins the horizon to the full-run
    length so every child anneals on the same curve."""
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    total = max_steps if max_steps is not None else cfg.max_number_of_steps
    horizon = schedule_total if schedule_total is not None else total
    if horizon != cfg.max_number_of_steps:
        cfg = dataclasses.replace(cfg, max_number_of_steps=horizon)
    priors = jnp.asarray(priors, jnp.float32)
    model = build_model(cfg, priors.shape[0])
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed), priors.shape[0])

    # Multi-host: orbax's manager init/restore below issues the job's FIRST
    # cross-host collective, and the host work above it (imports, state
    # init compiles) skews processes by more than Gloo's fixed 30 s
    # rendezvous window on slow hosts. Align first (parallel.sync).
    coordination_barrier("train/pre_checkpoint_manager")
    ckpt = CheckpointManager(
        logdir, keep=cfg.keep_checkpoints, save_every=cfg.save_every_steps
    )
    start_step = 0
    latest = ckpt.latest_step()
    if latest is not None:
        log.info("resuming from checkpoint step %d", latest)
        state = ckpt.restore(state)
        start_step = int(latest)
    elif pretrained_model:
        state = _restore_pretrained(state, pretrained_model)

    step_fn = make_augmented_train_step(cfg, model, priors)
    chunk = max(1, int(cfg.steps_per_host_transfer))
    devices = jax.devices()
    if use_mesh and len(devices) > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = make_mesh(devices, cfg.data_axis)
        pstep = make_parallel_train_step(step_fn, mesh, cfg.data_axis)
        state = replicate_state(state, mesh)

        def put(batch):
            return shard_batch(batch, mesh, cfg.data_axis)

        if chunk > 1:
            # Superbatch [K, B, ...]: chunk axis unsharded, batch axis on
            # the data mesh axis.
            super_sharding = NamedSharding(
                mesh, PartitionSpec(None, cfg.data_axis)
            )
            repl = NamedSharding(mesh, PartitionSpec())
            cstep = jax.jit(
                make_chunked_step(step_fn, chunk),
                in_shardings=(repl, super_sharding),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )

            def put_super(sb):
                from multibox_tpu.parallel.mesh import put_host_local

                # Batch axis is dim 1 of the [K, B, ...] superbatch.
                return jax.tree.map(
                    lambda x: put_host_local(x, super_sharding, batch_dim=1),
                    sb,
                )

    else:
        pstep = jax.jit(step_fn, donate_argnums=(0,))

        def put(batch):
            return jax.device_put(batch)

        if chunk > 1:
            from multibox_tpu.utils.transfer import fast_device_put

            cstep = jax.jit(
                make_chunked_step(step_fn, chunk), donate_argnums=(0,)
            )

            def put_super(sb):
                # Chunked transfer: a K-batch superbatch can exceed the
                # link's large-transfer stall threshold (~64 MB on the
                # relay); fast_device_put splits it into ≤32 MB pieces.
                return fast_device_put(sb, devices[0])

    canvas = canvas_size or max(int(cfg.input_size * 1.15), cfg.input_size)
    # cfg.batch_size is the GLOBAL batch. On a multi-host mesh each
    # process decodes only its slice; put_host_local assembles the global
    # sharded array from the per-process slices.
    if cfg.batch_size % jax.process_count():
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by "
            f"process_count {jax.process_count()}"
        )
    local_batch = cfg.batch_size // jax.process_count()
    dataset = DetectionDataset(
        tfrecords,
        batch_size=local_batch,
        canvas_size=canvas,
        max_num_bboxes=cfg.max_num_bboxes,
        # shuffle=False exists for deterministic trajectory-parity tests
        # (multi-host vs single-host) — production runs keep the default.
        shuffle=shuffle,
        repeat=True,
        # Mix the resume step into the shuffle seed: a resumed run (or
        # each --restart_every_steps child) must NOT replay the stream
        # from the top, or a run chained from bounded segments only ever
        # trains on the first segment's records. Same seed on every host
        # of a sharded run (start_step comes from the shared checkpoint),
        # so path order stays host-identical.
        seed=cfg.seed + start_step,
        decode_draft=cfg.decode_draft,
        cache_items=cfg.decode_cache_items,
        label_offset=cfg.label_offset,
        # Multi-class: out-of-range labels must fail loudly at the host
        # (on-device they silently become background; VERDICT round-2 #5).
        num_classes=cfg.num_classes if cfg.num_classes > 1 else None,
        # Multi-host DP: each process feeds a disjoint record shard (the
        # mesh shards the global batch over all devices; every process
        # supplies its local slice from its own records).
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
    )
    # Multi-host: every process trains, but only process 0 writes metrics —
    # N processes appending to one metrics.jsonl / events dir on a shared
    # logdir would interleave identical (replicated) records.
    writer = MetricsWriter(logdir, enabled=jax.process_index() == 0)

    if jax.process_count() > 1 and use_mesh and len(devices) > 1:
        # AOT-compile the step program(s), THEN align. jit-on-first-call
        # would put each process's compile (minutes on a contended host,
        # with unbounded inter-process skew) inside the first gradient
        # all-reduce's 30 s Gloo rendezvous window (parallel.sync). After
        # the fence every process launches the first step together.
        from multibox_tpu.parallel.mesh import batch_sharding

        gbatch = cfg.batch_size

        def batch_specs(lead, sharding):
            specs = {
                "images": jax.ShapeDtypeStruct(
                    lead + (gbatch, canvas, canvas, 3), jnp.uint8,
                    sharding=sharding,
                ),
                "boxes": jax.ShapeDtypeStruct(
                    lead + (gbatch, cfg.max_num_bboxes, 4), jnp.float32,
                    sharding=sharding,
                ),
                "num_boxes": jax.ShapeDtypeStruct(
                    lead + (gbatch,), jnp.int32, sharding=sharding
                ),
            }
            if cfg.num_classes > 1:
                specs["labels"] = jax.ShapeDtypeStruct(
                    lead + (gbatch, cfg.max_num_bboxes), jnp.int32,
                    sharding=sharding,
                )
            return specs

        pstep = pstep.lower(
            state, batch_specs((), batch_sharding(mesh, cfg.data_axis))
        ).compile()
        if chunk > 1:
            cstep = cstep.lower(
                state, batch_specs((chunk,), super_sharding)
            ).compile()
        coordination_barrier("train/step_compiled")

    def host_batches():
        for batch in dataset:
            out = {
                "images": batch["images"],
                "boxes": batch["boxes"],
                "num_boxes": batch["num_boxes"],
            }
            if cfg.num_classes > 1:
                out["labels"] = batch["labels"]
            yield out

    t_last = time.time()
    step_idx = start_step
    last_logged_step = start_step
    profiling = False
    profiled = False  # one-shot: the window must not re-arm after stopping
    profile_start_step = start_step
    eval_fns = None
    eval_gt = None  # ground truth parsed once per run, not per eval
    pending: list = []

    def run_pending(state, pending, step_idx):
        """Run buffered host batches: one chunked device call when a full
        chunk is buffered, per-batch steps otherwise (the final partial
        chunk — reuses the single-step program)."""
        if chunk > 1 and len(pending) == chunk:
            superbatch = {
                k: np.stack([b[k] for b in pending]) for k in pending[0]
            }
            state, metrics = cstep(state, put_super(superbatch))
            return state, metrics, step_idx + len(pending)
        metrics = None
        for b in pending:
            state, metrics = pstep(state, put(b))
            step_idx += 1
        return state, metrics, step_idx

    try:
        # NOTE: device_put stays on the main thread — a background-thread
        # put contends with step dispatch on jax's client lock and halves
        # throughput on small hosts (measured).
        for batch in Prefetcher(host_batches(), depth=3):
            if step_idx >= total:
                break
            pending.append(batch)
            if len(pending) < min(chunk, total - step_idx):
                continue
            # Profiler window (SURVEY.md §5.1): one-shot trace of at least
            # profile_steps steady-state steps, armed after the first
            # (compile-bearing) iteration. Start is checked BEFORE the
            # device call and stop AFTER it, so chunked runs (step_idx
            # advances by K) always capture >= profile_steps real steps;
            # `profiled` keeps the window from re-arming every iteration.
            if (
                cfg.profile_steps
                and not profiled
                and not profiling
                and step_idx >= start_step + 1
            ):
                jax.profiler.start_trace(logdir)
                profiling = True
                profile_start_step = step_idx
            prev_step = step_idx
            state, metrics, step_idx = run_pending(state, pending, step_idx)
            pending = []
            if profiling and step_idx >= profile_start_step + cfg.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                profiled = True
                log.info("wrote profiler trace to %s", logdir)

            if (
                step_idx // cfg.log_every_steps > prev_step // cfg.log_every_steps
                or step_idx == total
            ):
                metrics = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                # Use the actual step count since the last log — the final
                # log can fire on a partial interval.
                steps_done = step_idx - last_logged_step
                ips = cfg.batch_size * steps_done / max(now - t_last, 1e-9)
                t_last = now
                last_logged_step = step_idx
                metrics["images_per_sec"] = ips
                writer.write(step_idx, metrics)
                log.info(
                    "step %d loss=%.4f (conf=%.4f loc=%.4f) %.1f img/s",
                    step_idx, metrics["loss"], metrics["loss_conf"],
                    metrics["loss_loc"], ips,
                )
            if (
                cfg.image_summary_steps
                and step_idx // cfg.image_summary_steps
                > prev_step // cfg.image_summary_steps
            ):
                # `batch` is the most recent HOST input canvas (pre-aug;
                # see utils.metrics.MetricsWriter.write_images docstring).
                writer.write_images(
                    step_idx, batch["images"], batch["boxes"],
                    batch["num_boxes"],
                )
            if (
                eval_tfrecords
                and eval_every_steps
                and step_idx // eval_every_steps > prev_step // eval_every_steps
            ):
                if eval_fns is None:
                    from multibox_tpu.cli.evaluate import load_groundtruth

                    eval_fns = make_eval_fns(cfg, priors)
                    if cfg.num_classes > 1:
                        eval_gt = load_groundtruth(
                            eval_tfrecords, with_labels=True,
                            label_offset=cfg.label_offset,
                        )
                    else:
                        eval_gt = load_groundtruth(eval_tfrecords)
                metrics = evaluate_state(
                    cfg, state, priors, eval_tfrecords, eval_fns, gt=eval_gt
                )
                writer.write(
                    step_idx, {f"eval/{k}": v for k, v in metrics.items()}
                )
                if "mAP@0.5" in metrics:
                    log.info(
                        "eval @%d: AP@0.5=%.3f mAP@0.5(per-class)=%.3f "
                        "mAP=%.3f recall=%.3f",
                        step_idx, metrics["AP@0.5"], metrics["mAP@0.5"],
                        metrics["mAP@[.5:.95]/per_class"],
                        metrics["recall@0.5"],
                    )
                else:
                    log.info(
                        "eval @%d: AP@0.5=%.3f mAP=%.3f recall=%.3f",
                        step_idx, metrics["AP@0.5"], metrics["mAP@[.5:.95]"],
                        metrics["recall@0.5"],
                    )
            if chunk > 1:
                # step_idx advances by K: orbax's modulo cadence would
                # never fire, so save on save_every boundary crossings.
                if step_idx // cfg.save_every_steps > prev_step // cfg.save_every_steps:
                    ckpt.save(step_idx, state, force=True)
            else:
                ckpt.save(step_idx, state)
        ckpt.wait()
        if ckpt.latest_step() != step_idx:
            ckpt.save(step_idx, state, force=True)
            ckpt.wait()
    finally:
        if profiling:
            jax.profiler.stop_trace()
        writer.close()
        ckpt.close()
    return state


_BACKBONE_SCOPES = ("InceptionV3", "MobileNetV2")


def _restore_pretrained(state: TrainState, path: str) -> TrainState:
    """Restore a pretrained backbone (reference behavior: restore with the
    head scopes EXCLUDED — SURVEY.md §3.1). Three source formats:

    - a tf-slim checkpoint (name mapping via models.tf_import)
    - a keras ``.h5``/``.keras`` file
    - an orbax logdir from a previous ``multibox-train`` run — the
    warm-start path: the source's EMA shadows (the slim convention for
    published weights) replace this state's backbone subtree; the head and
    optimizer stay freshly initialized.
    """
    from multibox_tpu.models import tf_import

    if os.path.isdir(path):
        probe = CheckpointManager(path)
        has_orbax = probe.latest_step() is not None
        probe.close()
        if has_orbax:
            return _warm_start_from_logdir(state, path)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if path.endswith((".h5", ".keras")):
        import tensorflow as tf

        keras_model = tf.keras.models.load_model(path)
        variables = tf_import.import_keras_inception_v3(keras_model, variables)
    else:
        variables = tf_import.import_slim_checkpoint(path, variables)
    log.info("restored pretrained backbone from %s", path)
    return state.replace(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
    )


def _warm_start_from_logdir(state: TrainState, path: str) -> TrainState:
    """Copy the backbone subtree (params + batch_stats, EMA-preferred) out
    of another run's latest checkpoint into a fresh state."""
    ckpt = CheckpointManager(path)
    raw = ckpt.restore_raw()
    ckpt.close()
    src_params = raw.get("ema_params") or raw["params"]
    src_stats = raw.get("batch_stats") or {}

    scopes = [
        s for s in _BACKBONE_SCOPES if s in src_params and s in state.params
    ]
    if not scopes:
        raise ValueError(
            f"no common backbone scope between {path} "
            f"({sorted(src_params)}) and this model ({sorted(state.params)})"
        )

    def graft(dst, src, what):
        mismatch = []

        def check(p, a, b):
            if tuple(a.shape) != tuple(np.shape(b)):
                mismatch.append((p, tuple(a.shape), tuple(np.shape(b))))
            return jnp.asarray(b, a.dtype)

        out = jax.tree_util.tree_map_with_path(
            lambda p, a, b: check(p, a, b), dst, src
        )
        if mismatch:
            raise ValueError(
                f"warm-start {what} shape mismatch (differing backbone "
                f"config?): {mismatch[:5]}"
            )
        return out

    new_params = dict(state.params)
    new_stats = dict(state.batch_stats)
    for s in scopes:
        new_params[s] = graft(state.params[s], src_params[s], f"params/{s}")
        if s in src_stats and s in new_stats:
            new_stats[s] = graft(
                state.batch_stats[s], src_stats[s], f"batch_stats/{s}"
            )
    log.info(
        "warm-started backbone scope(s) %s from %s (EMA weights)", scopes, path
    )
    return state.replace(
        params=new_params,
        batch_stats=new_stats,
        ema_params=jax.tree.map(jnp.copy, new_params),
    )
