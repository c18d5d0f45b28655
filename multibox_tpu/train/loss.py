"""MultiBox loss: matching + location L2 + confidence BCE + hard negatives.

Implements the training objective of Erhan et al. (arXiv:1312.2249 eq.1–3)
with the prior-matching formulation of Szegedy et al. (arXiv:1412.1441 §2),
replacing the reference's ``add_loss`` + host-side Hungarian
(ref:loss.py / SURVEY.md §2 C6–C7) with a single on-device computation:

  F_loc  = ½ Σ_matched ‖l_pred − l_target‖²        (l_target = g − prior)
  F_conf = − Σ_matched log σ(c) − Σ_selected-neg log(1 − σ(c))
  F      = F_conf + α · F_loc

Both terms are normalized by the number of matched priors across the batch
(SSD convention — keeps gradient scale independent of object count).

Hard-negative mining (BASELINE.json configs[2]): per image, only the
``ratio × num_pos`` highest-loss negatives contribute to F_conf, selected
by rank inside the jitted program (no dynamic shapes).

Matching runs per-image under vmap; gradients do NOT flow through the
assignment (stop-gradient semantics arise naturally since the assignment is
integer-valued), matching the reference where matching happened in numpy.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multibox_tpu.ops import matching as matching_ops


def multibox_loss(
    loc_preds: jnp.ndarray,
    conf_logits: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    num_gt: jnp.ndarray,
    priors: jnp.ndarray,
    alpha: float = 1.0,
    matching: str = "greedy",
    hybrid_conf_weight: float = 0.0,
    hard_negative_ratio: float = 3.0,
    multi_match_iou: float = 0.0,
    encode: str = "multibox",
    gt_labels: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    conf_loss: str = "bce",
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Batched MultiBox loss.

    Args:
      loc_preds: ``[B, P, 4]`` predicted offsets.
      conf_logits: ``[B, P]`` class-agnostic logits (reference behavior) or
        ``[B, P, C]`` multi-class logits (sigmoid per class).
      gt_boxes: ``[B, G, 4]`` normalized corner boxes (padded).
      num_gt: ``[B]`` valid gt count per image.
      priors: ``[P, 4]``.
      alpha: location-loss weight (reference ``LOCATION_LOSS_ALPHA``).
      matching: "greedy" | "hungarian".
      hybrid_conf_weight: >0 → loss-aware matching (1412.1441 §2.1).
      hard_negative_ratio: negatives kept per positive (0 → keep all).
      multi_match_iou: >0 → SSD dense matching (arXiv:1512.02325 §2.2) on
        top of the bipartite assignment: every prior with best-gt IoU ≥
        this also becomes a positive. Fixes the 1-to-1 confidence
        equilibrium under augmentation (see ops.matching
        ``dense_prior_assignment``).
      encode: target encoding ("multibox" residual | "ssd").
      gt_labels: ``[B, G]`` int class ids in ``[0, C)`` — required when
        ``conf_logits`` is multi-class. Out-of-range ids are counted in
        the ``num_bad_labels`` metric (the host pipeline should already
        have rejected them — see ``cfg.label_offset``).
      conf_loss: "bce" (reference) | "focal" — RetinaNet focal sigmoid CE
        (arXiv:1708.02002): α_t·(1−p_t)^γ·BCE. Down-weights easy
        negatives so rare-class confidence keeps a gradient; pair with
        ``hard_negative_ratio=0`` (mining is redundant under focal).
      use_pallas: ``True`` routes greedy IoU matching to the batched
        Pallas kernel. Only applies to pure-IoU greedy matching
        (``matching="greedy"``, ``hybrid_conf_weight=0``); other
        configurations — and the None/auto default — use the jnp path
        (see routing comment below for the measurements).

    Returns (total_loss scalar, metrics dict). Metrics include
    ``num_gt_dropped``: active gt boxes that received no prior (e.g. the
    documented ``num_gt > P`` truncation) — nonzero values mean silent
    label loss on crowded images; raise ``num_priors``.
    """
    multiclass = conf_logits.ndim == 3
    B, P = conf_logits.shape[:2]
    # Class-agnostic confidence drives hybrid matching in both modes.
    conf_agn = (
        jnp.max(conf_logits, axis=-1) if multiclass else conf_logits
    )  # [B, P]

    # Explicit opt-in: measured on the v5e the kernel wins ISOLATED
    # (loss+match 2.27 vs 8.07 ms chained, B=32 G=16 P=256 — benefit
    # matrix VMEM-resident across all G rounds) but in the FULL train step
    # it costs ~1–3 ms (29.4–30.4 vs 27.2–28.8 ms/step over repeated
    # runs): inside the big fwd+bwd graph XLA schedules its matching loop
    # well, and the pallas_call acts as a fusion barrier. Auto therefore
    # keeps XLA here; see BASELINE.md decision matrix.
    pallas_match = (
        use_pallas is True
        and matching == "greedy"
        and not hybrid_conf_weight
    )
    if pallas_match:
        # Batch-native kernel: per-image benefit matrix + G-round argmax
        # loop fully VMEM-resident (ops.pallas.match_kernel).
        from multibox_tpu.ops.pallas.match_kernel import (
            greedy_match_pallas_batched,
        )

        assignment = greedy_match_pallas_batched(gt_boxes, num_gt, priors)
        prior_gt = jax.vmap(
            lambda a, g, n: matching_ops.dense_prior_assignment(
                a, g, n, priors, multi_match_iou
            )
        )(assignment, gt_boxes, num_gt)
        conf_t, loc_t, matched = jax.vmap(
            lambda pg, g: matching_ops.dense_targets(pg, g, priors, encode)
        )(prior_gt, gt_boxes)
    else:

        def match_one(gt, n, conf, loc):
            return matching_ops.match_priors(
                gt,
                n,
                priors,
                conf_logits=jax.lax.stop_gradient(conf),
                loc_preds=jax.lax.stop_gradient(loc),
                method=matching,
                conf_weight=hybrid_conf_weight,
                alpha=alpha,
                encode=encode,
                multi_match_iou=multi_match_iou,
            )

        assignment, prior_gt, conf_t, loc_t, matched = jax.vmap(match_one)(
            gt_boxes, num_gt, conf_agn, loc_preds
        )
    # conf_t/loc_t are targets — constants w.r.t. the params.
    conf_t = jax.lax.stop_gradient(conf_t)  # [B, P]
    loc_t = jax.lax.stop_gradient(loc_t)  # [B, P, 4]

    num_pos = jnp.sum(conf_t, axis=1)  # [B]
    total_pos = jnp.maximum(jnp.sum(num_pos), 1.0)

    # Location loss over matched priors only.
    sq = jnp.sum((loc_preds - loc_t) ** 2, axis=-1)  # [B, P]
    loc_loss = 0.5 * jnp.sum(sq * conf_t) / total_pos

    if conf_loss == "focal":
        def conf_ce(logits, labels):
            return focal_sigmoid_bce(logits, labels, focal_gamma, focal_alpha)
    elif conf_loss == "bce":
        conf_ce = optax_sigmoid_bce
    else:
        raise ValueError(f"unknown conf_loss: {conf_loss!r}")

    num_bad_labels = jnp.float32(0.0)
    if multiclass:
        if gt_labels is None:
            raise ValueError("gt_labels required for multi-class conf_logits")
        C = conf_logits.shape[-1]
        # Per-prior class targets: gather each prior's gt label (dense —
        # several priors may share one gt under multi_match_iou).
        safe_pg = jnp.maximum(prior_gt, 0)
        cls_t = jax.lax.stop_gradient(
            jnp.where(
                prior_gt >= 0,
                jnp.take_along_axis(
                    gt_labels.astype(jnp.int32), safe_pg, axis=1
                ),
                -1,
            )
        )
        onehot = jnp.logical_and(
            cls_t[..., None] == jnp.arange(C)[None, None, :],
            matched[..., None],
        ).astype(conf_logits.dtype)  # [B, P, C]
        # Out-of-range gt labels produce an all-zero onehot at a matched
        # prior — the object would silently train as background. The host
        # pipeline rejects them; this metric is the on-device tripwire.
        G_lbl = gt_labels.shape[1]
        active_lbl = jnp.arange(G_lbl)[None, :] < num_gt[:, None]
        num_bad_labels = jnp.sum(
            jnp.logical_and(
                active_lbl,
                jnp.logical_or(gt_labels < 0, gt_labels >= C),
            ).astype(jnp.float32)
        )
        bce_full = conf_ce(conf_logits, onehot)  # [B, P, C]
        pos_loss = jnp.sum(bce_full * onehot) / total_pos
        # Per-prior negative score: all non-positive (prior, class) entries.
        bce = jnp.sum(bce_full * (1.0 - onehot), axis=-1)  # [B, P]
        # Matched priors' OTHER classes are mandatory negatives (never
        # mined away — otherwise a wrong class at a matched prior is never
        # penalized and class inference can't separate).
        pos_loss = pos_loss + jnp.sum(bce * conf_t) / total_pos
    else:
        # Confidence BCE (numerically stable form).
        bce = conf_ce(conf_logits, conf_t)  # [B, P]
        pos_loss = jnp.sum(bce * conf_t) / total_pos

    neg_mask = 1.0 - conf_t
    if hard_negative_ratio and hard_negative_ratio > 0:
        # Per image: keep the ratio·num_pos highest-loss negatives (at least
        # 1 so images with zero gt still push background down).
        neg_scores = bce * neg_mask  # [B, P]
        k = jnp.minimum(
            jnp.maximum(hard_negative_ratio * num_pos, 1.0), P - num_pos
        )  # [B] dynamic per image
        # Rank negatives by loss descending; keep rank < k.
        order = jnp.argsort(-neg_scores, axis=1)
        ranks = jnp.zeros_like(order).at[
            jnp.arange(B)[:, None], order
        ].set(jnp.broadcast_to(jnp.arange(P)[None, :], (B, P)))
        keep = (ranks < k[:, None]).astype(bce.dtype) * neg_mask
    else:
        keep = neg_mask
    neg_loss = jnp.sum(bce * keep) / total_pos

    conf_loss_val = pos_loss + neg_loss
    total = conf_loss_val + alpha * loc_loss
    # Active gt rows that received no prior: silent label loss (the
    # documented num_gt > P truncation, or an exhausted prior set).
    G = gt_boxes.shape[1]
    active_gt = jnp.arange(G)[None, :] < num_gt[:, None]  # [B, G]
    num_gt_dropped = jnp.sum(
        jnp.logical_and(active_gt, assignment < 0).astype(jnp.float32)
    )
    metrics = {
        "loss": total,
        "loss_conf": conf_loss_val,
        "loss_loc": loc_loss,
        "num_pos": jnp.sum(num_pos),
        "num_neg_kept": jnp.sum(keep),
        "num_gt_dropped": num_gt_dropped,
        "num_bad_labels": num_bad_labels,
    }
    return total, metrics


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Stable elementwise sigmoid BCE: max(x,0) − x·z + log(1 + e^{−|x|})."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal_sigmoid_bce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Elementwise focal sigmoid CE (arXiv:1708.02002 eq.4–5):
    α_t · (1 − p_t)^γ · BCE, with p_t = p for positives, 1−p otherwise.
    Built on the stable BCE so large |logits| don't overflow."""
    bce = optax_sigmoid_bce(logits, labels)
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    return alpha_t * jnp.power(jnp.maximum(1.0 - p_t, 1e-8), gamma) * bce
