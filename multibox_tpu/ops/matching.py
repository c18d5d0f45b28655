"""Bipartite prior ↔ ground-truth matching, fully on-device.

The reference computes per-image assignments of ground-truth boxes to
distinct priors by maximizing a benefit (IoU, optionally blended with the
current predicted confidences — the "hybrid" matching of Szegedy et al.,
arXiv:1412.1441 §2.1) via scipy Hungarian inside a ``tf.py_func`` — a
host↔device round trip on every training step (SURVEY.md §3.1 boundary #2).

Here matching runs inside the jitted step, static shapes, batched via vmap:

* :func:`greedy_match` — iterative global-argmax matching. ``G`` rounds of
  argmax over the ``[G, P]`` benefit matrix, masking the chosen row+column
  each round. Deterministic, fast, and for detection-style benefit matrices
  (strong diagonal dominance) almost always identical to the optimal
  assignment. **Default for training.**
* :func:`hungarian_match` — exact rectangular assignment via the
  Jonker–Volgenant shortest-augmenting-path algorithm (the same algorithm
  as ``scipy.optimize.linear_sum_assignment``): ``lax.scan`` over gt rows,
  a ``lax.while_loop`` Dijkstra (with dual potentials) per row. Optimal
  total benefit, static shapes, jit/vmap-compatible.

Both handle padded gt rows via ``num_gt`` and return, per image,
``assignment[G]`` (prior index per gt, ``-1`` for padded rows).
:func:`matching_targets` converts assignments into the per-prior training
targets the loss consumes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from multibox_tpu.ops import boxes as box_ops

_NEG = -1e30  # effectively -inf, but safe in arithmetic
_INF = jnp.inf


def compute_benefit(
    gt_boxes: jnp.ndarray,
    priors: jnp.ndarray,
    conf_logits: Optional[jnp.ndarray] = None,
    loc_preds: Optional[jnp.ndarray] = None,
    alpha: float = 1.0,
    conf_weight: float = 0.0,
) -> jnp.ndarray:
    """Benefit matrix ``[G, P]`` for assignment (higher = better match).

    Default benefit is prior↔gt IoU (the "prior matching" of 1412.1441).
    With ``conf_weight > 0`` and predictions supplied, blends in the hybrid
    objective: ``benefit = iou + w·(logit(c) − α/2·‖l − g‖²)`` — matching
    then prefers priors that already predict the object, which is the
    paper's loss-aware matching up to the constant unmatched term.
    """
    benefit = box_ops.iou_matrix(gt_boxes, priors)  # [G, P]
    if conf_weight > 0.0 and conf_logits is not None:
        hybrid = conf_logits[None, :]  # log(c/(1−c)): moving prior to matched
        if loc_preds is not None:
            decoded = box_ops.decode_boxes(loc_preds, priors, clip=False)  # [P, 4]
            sq = jnp.sum((decoded[None, :, :] - gt_boxes[:, None, :]) ** 2, axis=-1)
            hybrid = hybrid - 0.5 * alpha * sq
        benefit = benefit + conf_weight * hybrid
    return benefit


def greedy_match(benefit: jnp.ndarray, num_gt: jnp.ndarray) -> jnp.ndarray:
    """Greedy 1-to-1 matching: repeatedly take the global best (gt, prior) pair.

    Args:
      benefit: ``[G, P]`` benefit matrix.
      num_gt: scalar int — rows ``>= num_gt`` are padding and get ``-1``.

    Returns:
      ``[G]`` int32 — prior index assigned to each gt (``-1`` for padding).
    """
    G, P = benefit.shape
    active = jnp.arange(G) < num_gt  # [G]
    masked = jnp.where(active[:, None], benefit, _NEG)

    def body(_, state):
        masked, assignment = state
        flat_idx = jnp.argmax(masked)  # global best pair
        i, j = flat_idx // P, flat_idx % P
        valid = masked[i, j] > _NEG / 2
        assignment = jnp.where(
            valid, assignment.at[i].set(j.astype(jnp.int32)), assignment
        )
        row_mask = jnp.arange(G) == i
        col_mask = jnp.arange(P) == j
        kill = jnp.logical_or(row_mask[:, None], col_mask[None, :])
        masked = jnp.where(jnp.logical_and(valid, kill), _NEG, masked)
        return masked, assignment

    assignment = jnp.full((G,), -1, dtype=jnp.int32)
    _, assignment = jax.lax.fori_loop(0, G, body, (masked, assignment))
    return assignment


class _DijkstraState(NamedTuple):
    i_cur: jnp.ndarray  # row currently being scanned
    min_val: jnp.ndarray  # distance of the last settled column
    shortest: jnp.ndarray  # [P] tentative shortest-path cost per column
    scanned_cols: jnp.ndarray  # [P] bool — settled columns
    scanned_rows: jnp.ndarray  # [G] bool — rows on the alternating tree
    pred: jnp.ndarray  # [P] predecessor row per column
    sink: jnp.ndarray  # settled unassigned column, or -1
    settled: jnp.ndarray  # columns settled so far (loop bound)


def _augment_one_row(cost, cur_row, u, v, col4row, row4col):
    """One JV phase: Dijkstra from ``cur_row`` to the nearest unassigned
    column in the reduced-cost graph, then dual update + path augmentation.

    Mirrors scipy's ``_lsap`` ``augmenting_path``/``solve`` exactly — with
    one addition: the search is BOUNDED at P settles (one column settles
    per iteration, so a sink is unreachable beyond that) and the update/
    augmentation steps are skipped when no sink was found. This matters
    under ``vmap``: ``lax.cond`` executes both branches there, so the
    "inactive row" branch of ``hungarian_match`` still runs this function
    on an exhausted column set — unbounded, that spins forever (the round-1
    num_gt > P hang, reincarnated batched).
    """
    G, P = cost.shape

    def cond(s: _DijkstraState):
        return jnp.logical_and(s.sink < 0, s.settled < P)

    def body(s: _DijkstraState):
        scanned_rows = s.scanned_rows.at[s.i_cur].set(True)
        r = s.min_val + cost[s.i_cur] - u[s.i_cur] - v  # [P] reduced dist
        better = jnp.logical_and(r < s.shortest, jnp.logical_not(s.scanned_cols))
        shortest = jnp.where(better, r, s.shortest)
        pred = jnp.where(better, s.i_cur, s.pred)
        cand = jnp.where(s.scanned_cols, _INF, shortest)
        # Prefer unassigned columns among ties (scipy's tie-break) by a
        # lexicographic argmin on (cost, assigned?).
        assigned_flag = (row4col >= 0).astype(cand.dtype)
        j = jnp.lexsort((assigned_flag, cand))[0].astype(jnp.int32)
        lowest = cand[j]
        scanned_cols = s.scanned_cols.at[j].set(True)
        is_sink = row4col[j] < 0
        return _DijkstraState(
            i_cur=jnp.where(is_sink, s.i_cur, row4col[j]),
            min_val=lowest,
            shortest=shortest,
            scanned_cols=scanned_cols,
            scanned_rows=scanned_rows,
            pred=pred,
            sink=jnp.where(is_sink, j, -1),
            settled=s.settled + 1,
        )

    init = _DijkstraState(
        i_cur=cur_row,
        min_val=jnp.zeros((), cost.dtype),
        shortest=jnp.full((P,), _INF, cost.dtype),
        scanned_cols=jnp.zeros((P,), bool),
        scanned_rows=jnp.zeros((G,), bool),
        pred=jnp.zeros((P,), jnp.int32),
        sink=jnp.int32(-1),
        settled=jnp.int32(0),
    )
    s = jax.lax.while_loop(cond, body, init)
    min_val, sink = s.min_val, s.sink
    found = sink >= 0  # False only on an exhausted column set (see above)

    # Dual updates (scipy _lsap.c solve()) — identity when no sink found.
    u_new = u.at[cur_row].add(min_val)
    other = jnp.logical_and(s.scanned_rows, jnp.arange(G) != cur_row)
    safe_cols = jnp.where(col4row >= 0, col4row, 0)
    u_new = u_new + jnp.where(other, min_val - s.shortest[safe_cols], 0.0)
    v_new = v - jnp.where(s.scanned_cols, min_val - s.shortest, 0.0)
    u = jnp.where(found, u_new, u)
    v = jnp.where(found, v_new, v)

    # Augment along the predecessor chain from the sink (skipped when no
    # sink: the initial `done` flag is already True).
    def aug_cond(state):
        _, _, _, done = state
        return jnp.logical_not(done)

    def aug_body(state):
        j, col4row, row4col, _ = state
        i = s.pred[j]
        row4col = row4col.at[j].set(i)
        prev = col4row[i]
        col4row = col4row.at[i].set(j)
        return prev, col4row, row4col, i == cur_row

    _, col4row, row4col, _ = jax.lax.while_loop(
        aug_cond,
        aug_body,
        (sink, col4row, row4col, jnp.logical_not(found)),
    )
    return u, v, col4row, row4col


def hungarian_match(benefit: jnp.ndarray, num_gt: jnp.ndarray) -> jnp.ndarray:
    """Exact max-benefit 1-to-1 assignment (Jonker–Volgenant, on-device).

    Solves the same rectangular LSAP as
    ``scipy.optimize.linear_sum_assignment(-benefit[:num_gt])``: every
    active gt row is assigned a distinct prior column maximizing the total
    benefit. Padded rows (``>= num_gt``) return ``-1``.

    Degenerate overflow (``num_gt > P``, infeasible for scipy): the FIRST
    ``P`` rows are matched optimally among themselves and the rest return
    ``-1`` — a documented truncation, not scipy's behavior (scipy raises).

    Returns ``[G]`` int32 prior index per gt.
    """
    G, P = benefit.shape
    cost = -benefit.astype(jnp.float32)
    # More gt rows than priors cannot all be assigned; clamping keeps the
    # augmenting search from spinning on an exhausted column set (the
    # overflow rows return -1 like padding).
    active = jnp.arange(G) < jnp.minimum(num_gt, P)

    def step(carry, i):
        u, v, col4row, row4col = carry

        def run(args):
            return _augment_one_row(cost, i, *args)

        u, v, col4row, row4col = jax.lax.cond(
            active[i], run, lambda args: args, (u, v, col4row, row4col)
        )
        return (u, v, col4row, row4col), None

    carry = (
        jnp.zeros((G,), jnp.float32),
        jnp.zeros((P,), jnp.float32),
        jnp.full((G,), -1, jnp.int32),
        jnp.full((P,), -1, jnp.int32),
    )
    (u, v, col4row, row4col), _ = jax.lax.scan(
        step, carry, jnp.arange(G, dtype=jnp.int32)
    )
    return jnp.where(active, col4row, -1)


def matching_targets(
    assignment: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    priors: jnp.ndarray,
    encode: str = "multibox",
    gt_labels: Optional[jnp.ndarray] = None,
):
    """Convert a per-gt assignment into per-prior training targets.

    Args:
      assignment: ``[G]`` prior index per gt (−1 = padded gt).
      gt_boxes: ``[G, 4]`` normalized corner boxes.
      priors: ``[P, 4]``.
      encode: ``"multibox"`` (residual) or ``"ssd"`` (center/log-scale).
      gt_labels: optional ``[G]`` int class ids (for multi-class training).

    Returns:
      conf_targets: ``[P]`` float — 1.0 for matched priors else 0.0.
      loc_targets: ``[P, 4]`` — encoded offsets (zeros for unmatched).
      matched: ``[P]`` bool mask.
      cls_targets: ``[P]`` int32 — matched gt's class id, −1 unmatched
        (only when ``gt_labels`` given; otherwise omitted).
    """
    P = priors.shape[0]
    valid = assignment >= 0

    conf_targets = (
        jnp.zeros((P,), dtype=jnp.float32)
        .at[jnp.where(valid, assignment, P)]
        .set(1.0, mode="drop")
    )
    matched = conf_targets > 0.5

    # Scatter each gt box onto its prior's row.
    gt_for_prior = (
        jnp.zeros((P, 4), dtype=gt_boxes.dtype)
        .at[jnp.where(valid, assignment, P)]
        .set(gt_boxes, mode="drop")
    )
    if encode == "multibox":
        offsets = box_ops.encode_boxes(gt_for_prior, priors)
    elif encode == "ssd":
        offsets = box_ops.encode_boxes_ssd(gt_for_prior, priors)
    else:
        raise ValueError(f"unknown encoding: {encode}")
    loc_targets = jnp.where(matched[:, None], offsets, 0.0)
    if gt_labels is None:
        return conf_targets, loc_targets, matched
    cls_targets = (
        jnp.full((P,), -1, jnp.int32)
        .at[jnp.where(valid, assignment, P)]
        .set(gt_labels.astype(jnp.int32), mode="drop")
    )
    return conf_targets, loc_targets, matched, cls_targets


def dense_prior_assignment(
    assignment: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    num_gt: jnp.ndarray,
    priors: jnp.ndarray,
    multi_match_iou: float = 0.0,
) -> jnp.ndarray:
    """Per-PRIOR gt index ``[P]`` (−1 = unmatched) from a per-gt bipartite
    assignment, optionally densified SSD-style.

    With ``multi_match_iou > 0`` this is the SSD matching strategy
    (arXiv:1512.02325 §2.2): after the bipartite best matches, EVERY prior
    whose best-gt IoU exceeds the threshold also becomes a positive for
    that gt. Measured motivation (BASELINE.md round-3 "multi-class quality
    loop"): under 1-to-1 matching with crop augmentation each object's
    best prior churns between grid neighbors, so any single prior is
    positive only ~25% of steps and BCE equilibrates its confidence at
    ~0.25 — dense matching makes every well-overlapping prior positive
    every step, letting confidences saturate.
    """
    G = gt_boxes.shape[0]
    P = priors.shape[0]
    valid = assignment >= 0
    prior_gt = (
        jnp.full((P,), -1, jnp.int32)
        .at[jnp.where(valid, assignment, P)]
        .set(jnp.arange(G, dtype=jnp.int32), mode="drop")
    )
    if multi_match_iou and multi_match_iou > 0:
        iou = box_ops.iou_matrix(gt_boxes, priors)  # [G, P]
        active = jnp.arange(G) < num_gt
        iou = jnp.where(active[:, None], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=0).astype(jnp.int32)  # [P]
        best_iou = jnp.max(iou, axis=0)
        extra = jnp.logical_and(best_iou >= multi_match_iou, prior_gt < 0)
        prior_gt = jnp.where(extra, best_gt, prior_gt)
    return prior_gt


def dense_targets(
    prior_gt: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    priors: jnp.ndarray,
    encode: str = "multibox",
    gt_labels: Optional[jnp.ndarray] = None,
):
    """Per-prior training targets from a per-PRIOR gt index ``[P]``.

    The dense counterpart of :func:`matching_targets` (which consumes the
    per-GT form); gathers instead of scatters, so several priors may share
    one gt (SSD multi-matching).
    """
    matched = prior_gt >= 0
    safe = jnp.maximum(prior_gt, 0)
    conf_targets = matched.astype(jnp.float32)
    gt_for_prior = gt_boxes[safe]
    if encode == "multibox":
        offsets = box_ops.encode_boxes(gt_for_prior, priors)
    elif encode == "ssd":
        offsets = box_ops.encode_boxes_ssd(gt_for_prior, priors)
    else:
        raise ValueError(f"unknown encoding: {encode}")
    loc_targets = jnp.where(matched[:, None], offsets, 0.0)
    if gt_labels is None:
        return conf_targets, loc_targets, matched
    cls_targets = jnp.where(matched, gt_labels[safe].astype(jnp.int32), -1)
    return conf_targets, loc_targets, matched, cls_targets


def match_priors(
    gt_boxes: jnp.ndarray,
    num_gt: jnp.ndarray,
    priors: jnp.ndarray,
    conf_logits: Optional[jnp.ndarray] = None,
    loc_preds: Optional[jnp.ndarray] = None,
    method: str = "greedy",
    conf_weight: float = 0.0,
    alpha: float = 1.0,
    encode: str = "multibox",
    multi_match_iou: float = 0.0,
):
    """Full per-image matching: benefit → assignment → per-prior targets.

    This is the single-image op; batch it with ``jax.vmap`` (see
    ``multibox_tpu.train.loss``). Replaces the reference's per-step
    ``tf.py_func`` → scipy Hungarian host escape (SURVEY.md §2 C6).

    ``multi_match_iou > 0`` adds SSD-style dense matching on top of the
    bipartite assignment (see :func:`dense_prior_assignment`).

    Returns ``(assignment [G], prior_gt [P], conf_t [P], loc_t [P, 4],
    matched [P])``.
    """
    benefit = compute_benefit(
        gt_boxes, priors, conf_logits, loc_preds, alpha=alpha, conf_weight=conf_weight
    )
    if method == "greedy":
        assignment = greedy_match(benefit, num_gt)
    elif method == "hungarian":
        assignment = hungarian_match(benefit, num_gt)
    else:
        raise ValueError(f"unknown matching method: {method}")
    prior_gt = dense_prior_assignment(
        assignment, gt_boxes, num_gt, priors, multi_match_iou
    )
    conf_t, loc_t, matched = dense_targets(prior_gt, gt_boxes, priors, encode)
    return assignment, prior_gt, conf_t, loc_t, matched
