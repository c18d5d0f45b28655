"""Pallas TPU kernel: batched NMS + top-k.

Semantics identical to ``multibox_tpu.ops.nms._nms_jnp`` (that function is
the spec; see its docstring). The win over the jnp/XLA formulation: boxes,
scores and the live-mask stay VMEM-resident across all K suppression
iterations — one kernel instead of K fused-op rounds through HBM.

Round-1 lesson (VERDICT item #3): a one-image-per-grid-cell kernel loses
batched because each instance uses a single sublane row of the VPU while
the vmapped XLA loop vectorizes across the batch. This formulation tiles
the BATCH onto the sublane dimension instead: each kernel instance owns a
``[BT, Ppad]`` block (BT=8 images), every step of the K-iteration
suppression loop is row-parallel vector math across all BT images, and the
grid runs over batch tiles. Single-image calls are the B=1 special case of
the same kernel.

Mosaic-lowering constraints shape the implementation (pallas_guide.md):
- 2D lanes-last layouts only (1D iota doesn't lower; TPU tiles are
  (sublane, 128)); reductions run along the lane axis with keepdims.
- NO dynamic indexing of VMEM vectors: winners are extracted with masked
  row reductions and per-iteration outputs written with masked selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multibox_tpu.ops.pallas import should_interpret

_NEG = -1e30
_BIG = 2**30

# Images per kernel instance = the f32 sublane tile height.
_BT = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(
    y0_ref, x0_ref, y1_ref, x1_ref,  # each [BT, Ppad] f32
    scores_ref,  # [BT, Ppad] f32
    sel_idx_ref,  # [BT, Kpad] i32 out
    sel_scores_ref,  # [BT, Kpad] f32 out
    *,
    p: int,
    ppad: int,
    k: int,
    kpad: int,
    iou_threshold: float,
    score_threshold: float,
):
    bt = y0_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, ppad), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bt, kpad), 1)
    in_range = col < p

    y0, x0, y1, x1 = y0_ref[...], x0_ref[...], y1_ref[...], x1_ref[...]
    area = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)

    scores = scores_ref[...]
    live0 = jnp.where(
        jnp.logical_and(in_range, scores >= score_threshold), scores, _NEG
    )

    sel_idx_ref[...] = jnp.full((bt, kpad), -1, jnp.int32)
    sel_scores_ref[...] = jnp.full((bt, kpad), -1.0, jnp.float32)

    def body(j, live):
        # Per-row (= per-image) winner: max score and its lowest index.
        best_score = jnp.max(live, axis=1, keepdims=True)  # [BT, 1]
        valid = best_score > _NEG / 2  # [BT, 1]
        best = jnp.min(
            jnp.where(live == best_score, col, _BIG), axis=1, keepdims=True
        )  # [BT, 1]

        write = jnp.logical_and(kcol == j, valid)  # [BT, Kpad]
        sel_idx_ref[...] = jnp.where(write, best, sel_idx_ref[...])
        sel_scores_ref[...] = jnp.where(
            write, best_score, sel_scores_ref[...]
        )

        # Winner coordinates via masked row-sum (one lane matches per row).
        sel = (col == best).astype(jnp.float32)  # [BT, Ppad]
        by0 = jnp.sum(y0 * sel, axis=1, keepdims=True)
        bx0 = jnp.sum(x0 * sel, axis=1, keepdims=True)
        by1 = jnp.sum(y1 * sel, axis=1, keepdims=True)
        bx1 = jnp.sum(x1 * sel, axis=1, keepdims=True)
        barea = jnp.maximum(by1 - by0, 0.0) * jnp.maximum(bx1 - bx0, 0.0)

        ih = jnp.maximum(jnp.minimum(y1, by1) - jnp.maximum(y0, by0), 0.0)
        iw = jnp.maximum(jnp.minimum(x1, bx1) - jnp.maximum(x0, bx0), 0.0)
        inter = ih * iw
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

        suppress = jnp.logical_or(iou > iou_threshold, col == best)
        return jnp.where(jnp.logical_and(valid, suppress), _NEG, live)

    jax.lax.fori_loop(0, k, body, live0)


def nms_pallas_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = -jnp.inf,
    interpret=None,
):
    """Batched Pallas NMS: ``boxes [B, P, 4]``, ``scores [B, P]``.

    Returns ``(sel_boxes [B, K, 4], sel_scores [B, K], sel_idx [B, K],
    num_valid [B])`` — identical to ``vmap(ops.nms._nms_jnp)``.
    """
    b, p = scores.shape
    bpad = _round_up(max(b, _BT), _BT)
    ppad = _round_up(max(p, 128), 128)
    kpad = _round_up(max(max_outputs, 128), 128)

    def plane(c):
        x = boxes[:, :, c].astype(jnp.float32)
        return jnp.pad(x, ((0, bpad - b), (0, ppad - p)))

    planes = [plane(c) for c in range(4)]
    scores_pad = jnp.pad(
        scores.astype(jnp.float32),
        ((0, bpad - b), (0, ppad - p)),
        constant_values=_NEG,
    )

    kernel = functools.partial(
        _nms_kernel,
        p=p,
        ppad=ppad,
        k=max_outputs,
        kpad=kpad,
        iou_threshold=float(iou_threshold),
        score_threshold=float(score_threshold),
    )
    grid = (bpad // _BT,)
    sel_idx, sel_scores = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BT, ppad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 5,
        out_specs=(
            pl.BlockSpec((_BT, kpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, kpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, kpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, kpad), jnp.float32),
        ),
        interpret=should_interpret(interpret),
    )(*planes, scores_pad)

    sel_idx = sel_idx[:b, :max_outputs]
    sel_scores = sel_scores[:b, :max_outputs]
    num_valid = jnp.sum((sel_idx >= 0).astype(jnp.int32), axis=1)
    sel_boxes = jnp.where(
        (sel_idx >= 0)[..., None],
        jnp.take_along_axis(boxes, jnp.maximum(sel_idx, 0)[..., None], axis=1),
        0.0,
    )
    return sel_boxes, sel_scores, sel_idx, num_valid


def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    score_threshold: float = -jnp.inf,
    interpret=None,
):
    """Single-image Pallas NMS (B=1 case of the batched kernel).
    Same contract as ``ops.nms.nms``."""
    sel_boxes, sel_scores, sel_idx, num_valid = nms_pallas_batched(
        boxes[None],
        scores[None],
        max_outputs,
        iou_threshold,
        score_threshold,
        interpret=interpret,
    )
    return sel_boxes[0], sel_scores[0], sel_idx[0], num_valid[0]
