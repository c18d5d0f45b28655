"""Detection pipeline: forward → decode → threshold → NMS → top-k.

The TPU-native equivalent of ref:detect.py (SURVEY.md §2 C9, §3.2) — but
where the reference decodes/filters/NMS-es on the host in numpy after each
``sess.run``, here the ENTIRE post-processing runs inside one jitted XLA
program on device; only the final fixed-size detection arrays come back to
the host.

Decode semantics (parity-critical): ``box = prior + predicted_offset`` in
normalized corner coordinates, clipped to [0,1] — the DeepMultiBox residual
parameterization (arXiv:1312.2249), NOT the SSD center/log encoding (that
one is used only when ``cfg.box_encoding == "ssd"``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from multibox_tpu.config import Config
from multibox_tpu.models.detector import MultiBoxDetector
from multibox_tpu.ops import boxes as box_ops
from multibox_tpu.ops.nms import batched_nms, batched_soft_nms
from multibox_tpu.ops.pallas import resolve_use_pallas


def build_model(
    cfg: Config,
    num_priors: int,
    folded: bool = False,
    quantize: str = None,
) -> MultiBoxDetector:
    """Construct the detector module from a config (single source of truth
    for model hyperparameters across train / detect / export).

    ``folded=True`` builds the inference-only BN-folded variant (use with
    params from ``models.inception_v3.fold_batch_norms``); ``quantize``
    ("int8" | "calib") builds the int8 PTQ variant on top of it (use with
    variables from ``multibox_tpu.quantize.prepare_quantized_variables``)."""
    return MultiBoxDetector(
        folded=folded,
        quantize=quantize,
        use_pallas=cfg.use_pallas,
        num_priors=num_priors,
        backbone=cfg.backbone,
        mobilenet_width=cfg.mobilenet_width,
        head_type=cfg.head_type,
        num_classes=cfg.num_classes,
        compute_dtype=jnp.bfloat16
        if cfg.compute_dtype == "bfloat16"
        else jnp.float32,
        bottleneck_features=cfg.bottleneck_features,
        ssd_endpoints=tuple(cfg.ssd_endpoints),
        ssd_priors_per_cell=cfg.ssd_priors_per_cell,
        bn_momentum=cfg.bn_momentum,
    )


def postprocess(
    locations: jnp.ndarray,
    confidences: jnp.ndarray,
    priors: jnp.ndarray,
    cfg: Config,
) -> Dict[str, jnp.ndarray]:
    """Decode + score + NMS, fully on-device, static output shapes.

    Args:
      locations: ``[B, P, 4]`` predicted offsets.
      confidences: ``[B, P]`` logits (class-agnostic) or ``[B, P, C]``.
      priors: ``[P, 4]``.

    Multi-class models run the standard per-class score sweep by default
    (``cfg.per_class_detect``): each (prior, class) score is a candidate,
    top-k-pruned to ``cfg.detect_candidates`` per image, with NMS applied
    within each class.

    Returns dict with ``boxes [B, K, 4]``, ``scores [B, K]``,
    ``classes [B, K]`` (zeros when class-agnostic), ``num [B]``.
    """
    return select_detections(
        decode_candidates(locations, priors, cfg), confidences, cfg
    )


def decode_candidates(
    locations: jnp.ndarray, priors: jnp.ndarray, cfg: Config
) -> jnp.ndarray:
    """Offsets ``[B, P, 4]`` → clipped candidate boxes ``[B, P, 4]`` under
    the configured encoding."""
    if cfg.box_encoding == "multibox":
        return box_ops.decode_boxes(locations, priors[None], clip=True)
    return box_ops.decode_boxes_ssd(locations, priors[None], clip=True)


def select_detections(
    boxes: jnp.ndarray, confidences: jnp.ndarray, cfg: Config
) -> Dict[str, jnp.ndarray]:
    """Score + NMS over already-decoded candidate boxes (the back half of
    :func:`postprocess`; flip-TTA feeds it the union of both orientations'
    candidates, so the candidate axis need not equal the prior count)."""
    if confidences.ndim == 2:
        scores = jax.nn.sigmoid(confidences)  # [B, P]
        class_ids = None
    else:
        probs = jax.nn.sigmoid(confidences)  # [B, P, C]
        per_class = (
            cfg.per_class_detect if cfg.per_class_detect is not None else True
        )
        if per_class:
            # Per-class score sweep (standard VOC/COCO protocol): every
            # (prior, class) pair is a detection candidate, so one prior
            # can emit several classes. The [P·C] grid is top-k-pruned to
            # a static candidate budget, then a single NMS pass suppresses
            # within each class via the class-offset trick in batched_nms.
            B, P, C = probs.shape
            cand = min(cfg.detect_candidates, P * C)
            flat = probs.reshape(B, P * C)
            scores, top_idx = jax.lax.top_k(flat, cand)  # [B, cand]
            prior_idx = top_idx // C
            class_ids = (top_idx % C).astype(jnp.int32)
            boxes = jnp.take_along_axis(
                boxes, prior_idx[..., None], axis=1
            )  # [B, cand, 4]
        else:
            # Cheaper approximation: per-prior best class only — depresses
            # per-class AP when one prior covers objects of several classes
            # (measured on the pinned multi-class eval; see BASELINE.md).
            scores = jnp.max(probs, axis=-1)
            class_ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)

    if cfg.nms_mode == "soft":
        # Gaussian soft-NMS (arXiv:1704.04503): occluding true positives
        # decay instead of vanishing. jnp path only (the Pallas kernel
        # implements hard suppression).
        sel_boxes, sel_scores, sel_idx, num = batched_soft_nms(
            boxes,
            scores,
            cfg.max_detections,
            sigma=cfg.soft_nms_sigma,
            score_threshold=max(cfg.detect_score_threshold, 1e-3),
            class_ids=class_ids,
        )
    elif cfg.nms_mode == "hard":
        sel_boxes, sel_scores, sel_idx, num = batched_nms(
            boxes,
            scores,
            cfg.max_detections,
            iou_threshold=cfg.nms_iou_threshold,
            score_threshold=cfg.detect_score_threshold,
            class_ids=class_ids,
            use_pallas=resolve_use_pallas(cfg.use_pallas),
        )
    else:
        # A typo'd mode silently measuring the wrong NMS arm would poison
        # any quality A/B — fail loudly.
        raise ValueError(
            f"unknown nms_mode: {cfg.nms_mode!r} (expected 'hard' or 'soft')"
        )
    if class_ids is None:
        sel_classes = jnp.zeros(sel_scores.shape, jnp.int32)
    else:
        safe = jnp.maximum(sel_idx, 0)
        sel_classes = jnp.where(
            sel_idx >= 0, jnp.take_along_axis(class_ids, safe, axis=1), -1
        )
    return {
        "boxes": sel_boxes,
        "scores": sel_scores,
        "classes": sel_classes,
        "num": num,
    }


def apply_and_postprocess(model, apply_vars, images, priors, cfg: Config):
    """One forward pass + postprocess — the shared tail of every detect
    program (live, int8, exported).

    With ``cfg.flip_tta`` the batch doubles with horizontally-mirrored
    images inside the SAME apply (one conv program at 2B — MXU-friendly,
    not two dispatches), the mirrored pass's decoded boxes are flipped
    back (``ops.boxes.flip_boxes_horizontal``), and the union of both
    orientations' candidates goes through one NMS pass. ~2× detect FLOPs;
    measured quality delta pinned in BASELINE.md "Int8 PTQ and flip-TTA
    quality" (slightly negative on the mirror-symmetric pinned synth eval;
    validate per dataset before enabling).
    """
    if not cfg.flip_tta:
        locations, confidences = model.apply(apply_vars, images, train=False)
        return postprocess(locations, confidences, priors, cfg)
    B = images.shape[0]
    both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
    locations, confidences = model.apply(apply_vars, both, train=False)
    boxes = decode_candidates(locations, priors, cfg)
    boxes = jnp.concatenate(
        [boxes[:B], box_ops.flip_boxes_horizontal(boxes[B:])], axis=1
    )
    confidences = jnp.concatenate([confidences[:B], confidences[B:]], axis=1)
    return select_detections(boxes, confidences, cfg)


def make_detect_fn(cfg: Config, priors: jnp.ndarray, use_ema: bool = None):
    """Build the jitted batched detect step.

    Returns ``detect(variables, images) -> detections`` where ``images`` is
    ``[B, S, S, 3]`` float32 in [-1, 1] and detections are the static-shape
    arrays of :func:`postprocess`. ``variables`` may carry an ``ema``
    collection (moving-average shadows); when present and
    ``cfg.use_ema_for_detect``, EMA params are used — the reference's
    inference behavior (SURVEY.md §5.4).
    """
    return jax.jit(make_detect_body(cfg, priors, use_ema=use_ema))


def make_detect_body(cfg: Config, priors: jnp.ndarray, use_ema: bool = None):
    """The unjitted detect step — single source of the EMA-selection and
    postprocess semantics. ``make_detect_fn`` jits it; the mesh-sharded
    detect path wraps it with ``parallel.make_parallel_detect_fn``.

    Backbone/head compute stays on XLA's fused conv+BN+ReLU path by
    default: measured on the v5e, the BN-folded variant is SLOWER than
    XLA's eval-mode fusion (11.4 vs 9.2 ms/batch-32, even with the fold
    precomputed) and the Pallas head loses at skinny batch-sized matmuls
    (8.5 vs 8.2 ms) — see BASELINE.md "Pallas vs XLA decision matrix".
    The Pallas wins live in postprocess (batch-native NMS) and matching.
    """
    if cfg.quantize not in ("none", "int8"):
        # A typo'd mode silently measuring the f32 arm would poison any
        # quantization A/B — fail loudly (same rationale as nms_mode).
        raise ValueError(
            f"unknown quantize mode: {cfg.quantize!r} (expected 'none' or 'int8')"
        )
    if cfg.quantize == "int8":
        # Int8 PTQ path: EMA selection + BN folding + weight quantization
        # are already baked into the prepared variables
        # (quantize.prepare_quantized_variables) — apply them directly.
        model = build_model(cfg, priors.shape[0], folded=True, quantize="int8")
        priors_q = jnp.asarray(priors, jnp.float32)

        def detect_q(variables, images):
            return apply_and_postprocess(
                model,
                {"params": variables["params"], "quant": variables["quant"]},
                images,
                priors_q,
                cfg,
            )

        return detect_q

    model = build_model(cfg, priors.shape[0])
    priors = jnp.asarray(priors, jnp.float32)
    if use_ema is None:
        use_ema = cfg.use_ema_for_detect

    def detect(variables, images):
        params = variables["params"]
        if use_ema and "ema" in variables:
            params = variables["ema"]
        apply_vars = {"params": params}
        if "batch_stats" in variables:
            apply_vars["batch_stats"] = variables["batch_stats"]
        return apply_and_postprocess(model, apply_vars, images, priors, cfg)

    return detect


def _pack_dets(det):
    """Pack ``{boxes, scores, classes, num}`` into ONE ``[B, K, 7]`` f32
    array (4 box coords | score | class id | num-valid broadcast).

    The relay device link charges a flat ~0.4 s per transfer EVENT
    regardless of size, so draining four output leaves per batch dominated
    the detect loop (measured round 3: the loop ran at ~50 img/s while the
    device sustains ~4,000). One packed array = one D2H per device call.
    Class ids and counts are exact in f32 (< 2**24)."""
    b = det["boxes"].astype(jnp.float32)
    B, K = b.shape[0], b.shape[1]
    s = det["scores"].astype(jnp.float32)[..., None]
    c = det["classes"].astype(jnp.float32)[..., None]
    n = jnp.broadcast_to(
        det["num"].astype(jnp.float32)[:, None, None], (B, K, 1)
    )
    return jnp.concatenate([b, s, c, n], axis=-1)


def _unpack_dets(arr):
    """Host-side inverse of :func:`_pack_dets` on a numpy ``[B, K, 7]``."""
    boxes = arr[..., :4]
    scores = arr[..., 4]
    classes = arr[..., 5].astype(np.int32)
    nums = arr[:, 0, 6].astype(np.int32)
    return boxes, scores, classes, nums


def make_detect_loop_fns(cfg: Config, priors, use_ema: bool = None):
    """Jitted programs for :func:`run_detect_loop`, built once so repeated
    invocations (periodic in-training eval) reuse the traced functions
    instead of paying a fresh (remote) compile each time. All programs
    return PACKED detections (:func:`_pack_dets`) so the host drain costs
    one transfer per device call."""
    from multibox_tpu.data.augment import preprocess_eval

    body = make_detect_body(cfg, priors, use_ema=use_ema)
    chunk = max(1, int(cfg.steps_per_host_transfer))

    def one(variables, images):
        return _pack_dets(body(variables, preprocess_eval(images, cfg.input_size)))

    fns = {"body": body, "per_batch": jax.jit(one), "chunk": chunk}
    if chunk > 1:
        # K batches per device call: preprocess+detect scanned on device
        # over the superbatch's leading axis — one dispatch, one transfer
        # in, one packed [K, B, D, 7] transfer out.
        def chunked(variables, superimages):  # [K, B, S, S, 3] uint8
            def step(_, images):
                return None, one(variables, images)

            _, dets = jax.lax.scan(step, None, superimages)
            return dets  # [K, B, max_detections, 7]

        fns["chunked"] = jax.jit(chunked)

    # LOCAL devices only: detection has no cross-batch communication, so a
    # global mesh buys nothing on multi-host and its outputs would span
    # non-addressable devices. Each process runs its own local-device
    # program over its record shard; run_detect_loop merges the results.
    devices = jax.local_devices()
    if len(devices) > 1 and cfg.batch_size % len(devices) == 0:
        # Mesh-path program built HERE (not per run_detect_loop call) so
        # periodic in-training eval on a mesh reuses one traced function
        # instead of re-jitting per eval (a fresh remote compile each
        # time on high-latency links).
        from multibox_tpu.parallel.mesh import (
            make_mesh,
            make_parallel_detect_fn,
        )

        mesh = make_mesh(devices, cfg.data_axis)
        fns["mesh"] = mesh
        fns["pdetect"] = make_parallel_detect_fn(one, mesh, cfg.data_axis)
    return fns


def run_detect_loop(
    cfg: Config,
    variables,
    dataset,
    priors,
    score_threshold: float = None,
    use_ema: bool = None,
    fns=None,
):
    """Drive detection over a ``DetectionDataset``: the production host
    loop shared by the detect / eval / visualize CLIs and in-training eval.

    TPU-link discipline (the reference just looped ``sess.run``; SURVEY.md
    §3.2): batches ship as uint8 (4× smaller than f32 — preprocessing runs
    on device), ``cfg.steps_per_host_transfer=K`` groups K batches into ONE
    chunked ≤32 MB transfer + ONE scanned device call (the same pattern
    that bought the train loop 2.4× on this link), and the drain of group
    N's outputs overlaps group N+1's device work (1-deep pipeline). On a
    multi-device host the batch is sharded over the LOCAL devices. On a
    multi-HOST mesh each process runs this loop over its record shard
    (``dataset`` must be built with shard_index/shard_count = process
    index/count; ``cfg.batch_size`` is per-host) and the result lists
    all-gather at the end — every host returns the full global list.

    Returns a list of per-image dicts {image_id, boxes, scores, classes}
    with only valid, above-threshold slots (host numpy).
    """
    from multibox_tpu.data.pipeline import Prefetcher
    from multibox_tpu.utils.transfer import fast_device_put

    thr = cfg.detect_score_threshold if score_threshold is None else score_threshold
    if fns is None:
        fns = make_detect_loop_fns(cfg, priors, use_ema=use_ema)
    chunk = fns["chunk"]
    devices = jax.local_devices()
    use_mesh = len(devices) > 1 and cfg.batch_size % len(devices) == 0

    if jax.process_count() > 1:
        # Multi-HOST detect: each process runs THIS loop on its own local
        # devices over its shard of the records (cfg.batch_size is the
        # PER-HOST batch here), and the per-host result lists merge with
        # one all-gather at the end — every host returns the full, global
        # result list. The dataset must be process-sharded, or every host
        # would detect the same images and the merge would duplicate them.
        if getattr(dataset, "shard_count", 1) != jax.process_count():
            raise ValueError(
                "multi-host detect needs a process-sharded dataset: build "
                "it with shard_index=jax.process_index(), "
                f"shard_count=jax.process_count() (got shard_count="
                f"{getattr(dataset, 'shard_count', 1)} with "
                f"{jax.process_count()} processes)"
            )
    if use_mesh and "pdetect" in fns:
        # The parallel program was traced ONCE in make_detect_loop_fns —
        # periodic in-training eval must not re-jit it per invocation
        # (fresh remote compiles on high-latency links). preprocess_eval
        # runs inside the sharded program. The mesh spans LOCAL devices
        # only, so a plain device_put shards this host's batch (never
        # put_host_local — that assembles a process-spanning global array,
        # wrong for the per-host detect design above).
        from multibox_tpu.parallel.mesh import batch_sharding, replicated

        mesh = fns["mesh"]
        pdetect = fns["pdetect"]
        variables = jax.device_put(variables, replicated(mesh))
        batch_s = batch_sharding(mesh, cfg.data_axis)

        def dispatch(group):
            return [
                pdetect(
                    variables,
                    jax.device_put(np.asarray(b["images"]), batch_s),
                )
                for b in group
            ]

    else:

        def dispatch(group):
            if chunk > 1 and len(group) == chunk:
                superimages = np.stack([b["images"] for b in group])
                # The whole [K, B, D, 7] result drains in ONE transfer —
                # never slice per group-item on device (each slice is an
                # extra relay dispatch + fetch; measured round 3).
                return fns["chunked"](
                    variables, fast_device_put(superimages, devices[0])
                )
            return [
                fns["per_batch"](variables, jnp.asarray(b["images"]))
                for b in group
            ]

    results = []

    def drain(group, dets):
        if isinstance(dets, list):  # per-batch path: one [B, D, 7] each
            arrs = [np.asarray(d) for d in dets]
        else:  # chunked path: one [K, B, D, 7] fetch for the whole group
            whole = np.asarray(dets)
            arrs = [whole[i] for i in range(len(group))]
        for batch, arr in zip(group, arrs):
            boxes, scores, classes, nums = _unpack_dets(arr)
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

    inflight = None
    group = []
    for batch in Prefetcher(iter(dataset), depth=chunk + 1):
        group.append(batch)
        if len(group) < chunk:
            continue
        dets = dispatch(group)  # async — device works while we drain
        if inflight is not None:
            drain(*inflight)
        inflight = (group, dets)
        group = []
    if group:  # final partial group (per-batch path)
        dets = dispatch(group)
        if inflight is not None:
            drain(*inflight)
        inflight = (group, dets)
    if inflight is not None:
        drain(*inflight)
    if jax.process_count() > 1:
        # Merge the per-host shards: every host returns the full global
        # result list (allgather semantics), so eval metrics and output
        # files are identical everywhere.
        from multibox_tpu.parallel.gather import process_allgather_objects

        results = [
            r for part in process_allgather_objects(results) for r in part
        ]
        # Coverage tripwire: two hosts mis-wired with the SAME shard_index
        # (the guard above checks only shard_count) would detect one shard
        # twice and silently drop another — eval metrics would be wrong
        # with no symptom. Duplicate ids in the merged list catch that.
        ids = [r["image_id"] for r in results]
        if len(set(ids)) != len(ids):
            from collections import Counter

            dups = [k for k, n in Counter(ids).items() if n > 1]
            raise RuntimeError(
                f"multi-host gather merged duplicate image ids ({dups[:5]}"
                f"{'...' if len(dups) > 5 else ''}) — check that every "
                "process was built with a DISTINCT shard_index "
                "(= jax.process_index())"
            )
    return results
