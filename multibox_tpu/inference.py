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

from multibox_tpu.config import Config
from multibox_tpu.models.detector import MultiBoxDetector
from multibox_tpu.ops import boxes as box_ops
from multibox_tpu.ops.nms import batched_nms
from multibox_tpu.ops.pallas import resolve_use_pallas


def build_model(cfg: Config, num_priors: int, folded: bool = False) -> MultiBoxDetector:
    """Construct the detector module from a config (single source of truth
    for model hyperparameters across train / detect / export).

    ``folded=True`` builds the inference-only BN-folded variant (use with
    params from ``models.inception_v3.fold_batch_norms``)."""
    return MultiBoxDetector(
        folded=folded,
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

    Returns dict with ``boxes [B, K, 4]``, ``scores [B, K]``,
    ``classes [B, K]`` (zeros when class-agnostic), ``num [B]``.
    """
    if cfg.box_encoding == "multibox":
        boxes = box_ops.decode_boxes(locations, priors[None], clip=True)
    else:
        boxes = box_ops.decode_boxes_ssd(locations, priors[None], clip=True)

    if confidences.ndim == 2:
        scores = jax.nn.sigmoid(confidences)  # [B, P]
        class_ids = None
    else:
        # Multi-class: per-prior best class (sigmoid per class, class-wise NMS).
        probs = jax.nn.sigmoid(confidences)  # [B, P, C]
        scores = jnp.max(probs, axis=-1)
        class_ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)

    sel_boxes, sel_scores, sel_idx, num = batched_nms(
        boxes,
        scores,
        cfg.max_detections,
        iou_threshold=cfg.nms_iou_threshold,
        score_threshold=cfg.detect_score_threshold,
        class_ids=class_ids,
        use_pallas=resolve_use_pallas(cfg.use_pallas),
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
        locations, confidences = model.apply(apply_vars, images, train=False)
        return postprocess(locations, confidences, priors, cfg)

    return detect
