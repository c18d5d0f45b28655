"""Non-maximum suppression + top-k, static shapes, on-device.

Replaces the reference's ``tf.image.non_max_suppression`` C++ kernel
(SURVEY.md §2.2). Semantics match TF NMS: select boxes in descending score
order, suppressing any box whose IoU with an already-selected box exceeds
``iou_threshold``; boxes below ``score_threshold`` are never selected.

The jnp implementation here is the semantic spec; a Pallas TPU kernel with
identical outputs lives in ``multibox_tpu.ops.pallas.nms_kernel`` (selected
via ``use_pallas=True`` in :func:`nms`).

Returned shapes are static (``max_outputs``); invalid slots are marked with
score ``-1`` and box ``0``, plus an explicit ``num_valid`` count — the
standard padded-detection convention, which keeps the whole detect pipeline
jit-compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multibox_tpu.ops import boxes as box_ops


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = -jnp.inf,
    use_pallas: bool = False,
):
    """Single-class NMS over one image.

    Args:
      boxes: ``[P, 4]`` normalized corner boxes.
      scores: ``[P]``.
      max_outputs: static number of output slots (k).
      iou_threshold: suppression threshold.
      score_threshold: boxes scoring below this are never selected.
      use_pallas: route to the Pallas TPU kernel (same semantics).

    Returns:
      (sel_boxes ``[k, 4]``, sel_scores ``[k]``, sel_idx ``[k]`` int32,
      num_valid scalar int32). Empty slots: score −1, idx −1, box 0.
    """
    if use_pallas:
        from multibox_tpu.ops.pallas import nms_kernel

        sel_b, sel_s, sel_i, nv = nms_kernel.nms_pallas(
            boxes, scores, max_outputs, iou_threshold, score_threshold
        )
        # The kernel computes in f32 internally; match the jnp path's
        # output signature (score dtype follows the input) so both
        # use_pallas settings are drop-in interchangeable.
        return sel_b, sel_s.astype(scores.dtype), sel_i, nv
    return _nms_jnp(boxes, scores, max_outputs, iou_threshold, score_threshold)


def _nms_jnp(boxes, scores, max_outputs, iou_threshold, score_threshold):
    P = boxes.shape[0]
    live_scores = jnp.where(scores >= score_threshold, scores, -jnp.inf)

    def body(k, state):
        live_scores, sel_idx, sel_scores, num_valid = state
        best = jnp.argmax(live_scores).astype(jnp.int32)
        best_score = live_scores[best]
        valid = best_score > -jnp.inf

        sel_idx = sel_idx.at[k].set(jnp.where(valid, best, -1))
        sel_scores = sel_scores.at[k].set(jnp.where(valid, best_score, -1.0))
        num_valid = num_valid + valid.astype(jnp.int32)

        # Suppress the selected box and everything overlapping it.
        ious = box_ops.iou_matrix(boxes[best][None, :], boxes)[0]  # [P]
        suppress = jnp.logical_or(ious > iou_threshold, jnp.arange(P) == best)
        live_scores = jnp.where(
            jnp.logical_and(valid, suppress), -jnp.inf, live_scores
        )
        return live_scores, sel_idx, sel_scores, num_valid

    sel_idx = jnp.full((max_outputs,), -1, dtype=jnp.int32)
    sel_scores = jnp.full((max_outputs,), -1.0, dtype=scores.dtype)
    _, sel_idx, sel_scores, num_valid = jax.lax.fori_loop(
        0, max_outputs, body, (live_scores, sel_idx, sel_scores, jnp.int32(0))
    )
    sel_boxes = jnp.where(
        (sel_idx >= 0)[:, None], boxes[jnp.maximum(sel_idx, 0)], 0.0
    )
    return sel_boxes, sel_scores, sel_idx, num_valid


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    sigma: float = 0.5,
    score_threshold: float = 0.001,
):
    """Gaussian soft-NMS over one image (Bodla et al., arXiv:1704.04503).

    Instead of removing boxes that overlap a selection, their scores decay
    by ``exp(-iou²/σ)`` — overlapping true positives (occlusion) survive
    with reduced confidence rather than vanishing. Selection records the
    DECAYED score (the paper's protocol); a slot is invalid once the best
    remaining decayed score falls below ``score_threshold`` (soft-NMS
    needs a floor — decayed scores never reach exactly 0). Same static
    output convention as :func:`nms`.
    """
    P = boxes.shape[0]
    live = jnp.where(scores >= score_threshold, scores, -jnp.inf).astype(
        jnp.float32
    )

    def body(k, state):
        live, sel_idx, sel_scores, num_valid = state
        best = jnp.argmax(live).astype(jnp.int32)
        best_score = live[best]
        valid = best_score >= score_threshold

        sel_idx = sel_idx.at[k].set(jnp.where(valid, best, -1))
        sel_scores = sel_scores.at[k].set(jnp.where(valid, best_score, -1.0))
        num_valid = num_valid + valid.astype(jnp.int32)

        ious = box_ops.iou_matrix(boxes[best][None, :], boxes)[0]  # [P]
        decay = jnp.exp(-(ious * ious) / sigma)
        decayed = jnp.where(jnp.arange(P) == best, -jnp.inf, live * decay)
        live = jnp.where(valid, decayed, live)
        return live, sel_idx, sel_scores, num_valid

    sel_idx = jnp.full((max_outputs,), -1, dtype=jnp.int32)
    sel_scores = jnp.full((max_outputs,), -1.0, dtype=jnp.float32)
    _, sel_idx, sel_scores, num_valid = jax.lax.fori_loop(
        0, max_outputs, body, (live, sel_idx, sel_scores, jnp.int32(0))
    )
    sel_boxes = jnp.where(
        (sel_idx >= 0)[:, None], boxes[jnp.maximum(sel_idx, 0)], 0.0
    )
    return sel_boxes, sel_scores.astype(scores.dtype), sel_idx, num_valid


def _vmap_with_class_offset(nms_one, boxes, scores, class_ids):
    """Shared batching wrapper for hard/soft NMS: shift each class into a
    disjoint coordinate island (cross-class IoU = 0 → no suppression /
    decay across classes), run the per-image NMS under vmap, and gather
    the UN-offset boxes by selected index."""
    if class_ids is not None:
        offset = class_ids.astype(boxes.dtype)[..., None] * 2.0
        boxes_for_nms = boxes + offset
    else:
        boxes_for_nms = boxes

    def one(b, s, raw):
        sel_b, sel_s, sel_i, nv = nms_one(b, s)
        out_b = jnp.where((sel_i >= 0)[:, None], raw[jnp.maximum(sel_i, 0)], 0.0)
        return out_b, sel_s, sel_i, nv

    return jax.vmap(one)(boxes_for_nms, scores, boxes)


def batched_soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    sigma: float = 0.5,
    score_threshold: float = 0.001,
    class_ids: Optional[jnp.ndarray] = None,
):
    """Soft-NMS over a batch via vmap; ``class_ids`` restricts decay to
    within-class pairs (see :func:`_vmap_with_class_offset`)."""
    return _vmap_with_class_offset(
        lambda b, s: soft_nms(b, s, max_outputs, sigma, score_threshold),
        boxes, scores, class_ids,
    )


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = -jnp.inf,
    class_ids: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
):
    """NMS over a batch ``[B, P, 4]`` / ``[B, P]`` via vmap.

    With ``class_ids`` given (``[B, P]`` int), suppression only happens
    within a class (per-class NMS) — implemented with the standard
    coordinate-offset trick so a single NMS pass handles all classes.
    """
    if use_pallas:
        # Batch-native kernel: images tiled onto the VPU sublane axis, the
        # whole suppression loop VMEM-resident (ops.pallas.nms_kernel).
        from multibox_tpu.ops.pallas import nms_kernel

        if class_ids is not None:
            offset = class_ids.astype(boxes.dtype)[..., None] * 2.0
            boxes_for_nms = boxes + offset
        else:
            boxes_for_nms = boxes
        _, sel_s, sel_i, nv = nms_kernel.nms_pallas_batched(
            boxes_for_nms, scores, max_outputs, iou_threshold, score_threshold
        )
        sel_s = sel_s.astype(scores.dtype)  # f32 kernel → input score dtype
        out_b = jnp.where(
            (sel_i >= 0)[..., None],
            jnp.take_along_axis(
                boxes, jnp.maximum(sel_i, 0)[..., None], axis=1
            ),
            0.0,
        )
        return out_b, sel_s, sel_i, nv

    return _vmap_with_class_offset(
        lambda b, s: nms(b, s, max_outputs, iou_threshold, score_threshold),
        boxes, scores, class_ids,
    )
