"""Pallas TPU kernel: greedy bipartite prior matching.

Semantics identical to ``ops.matching.greedy_match`` over the IoU benefit
(that jnp path is the spec). The kernel computes the IoU benefit matrix
into VMEM scratch once and then runs the G-round global-argmax/suppress
loop entirely on-chip — the benefit matrix never touches HBM, vs. the XLA
formulation which materializes [G, P] and re-reads it every round.

``greedy_match_pallas_batched`` is the production entry (grid over the
batch; one image's full matching loop per instance, priors shared across
instances). The single-image ``greedy_match_pallas`` is its B=1 case.

Mosaic constraints: no dynamic VMEM indexing — the global argmax is done
as max-reduce + first-index-of-max via masked min over a flat index grid,
and the assignment vector is updated with masked full-vector writes.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _match_kernel(
    num_gt_ref,  # [B] i32 SMEM (whole array; indexed by program_id)
    gt_ref,  # [Gpad, 128] f32 — 4 coords in lanes 0..3
    pri_ref,  # [4, Ppad] f32 — coordinate planes
    assign_ref,  # [8, Apad] i32 VMEM out (8-row sublane tile; row 0 used)
    benefit,  # [Gpad, Ppad] f32 VMEM scratch
    *,
    g: int,
    gpad: int,
    p: int,
    ppad: int,
    apad: int,
):
    # Mosaic constraint: SMEM blocks can't be (1,)-sliced per grid cell,
    # but whole-array SMEM refs support dynamic scalar indexing.
    num_gt = num_gt_ref[pl.program_id(0)]
    del apad  # output block is [8, Apad]; all 8 rows carry the assignment

    py0 = pri_ref[0, :][None, :]
    px0 = pri_ref[1, :][None, :]
    py1 = pri_ref[2, :][None, :]
    px1 = pri_ref[3, :][None, :]
    parea = jnp.maximum(py1 - py0, 0.0) * jnp.maximum(px1 - px0, 0.0)  # [1,Ppad]

    col = jax.lax.broadcasted_iota(jnp.int32, (gpad, ppad), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (gpad, ppad), 0)
    acol = jax.lax.broadcasted_iota(jnp.int32, assign_ref.shape, 1)

    gy0 = gt_ref[:, 0][:, None]
    gx0 = gt_ref[:, 1][:, None]
    gy1 = gt_ref[:, 2][:, None]
    gx1 = gt_ref[:, 3][:, None]
    garea = jnp.maximum(gy1 - gy0, 0.0) * jnp.maximum(gx1 - gx0, 0.0)  # [Gpad,1]

    ih = jnp.maximum(jnp.minimum(gy1, py1) - jnp.maximum(gy0, py0), 0.0)
    iw = jnp.maximum(jnp.minimum(gx1, px1) - jnp.maximum(gx0, px0), 0.0)
    inter = ih * iw
    union = garea + parea - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

    active = jnp.logical_and(row < num_gt, col < p)
    benefit[...] = jnp.where(active, iou, _NEG)
    assign_ref[...] = jnp.full(assign_ref.shape, -1, jnp.int32)

    def body(k, _):
        m = benefit[...]
        best = jnp.max(m)
        valid = best > _NEG / 2
        # first (row-major) cell attaining the max — argmax tie parity
        flat = jnp.min(jnp.where(m == best, row * ppad + col, _BIG))
        i = flat // ppad
        j = flat % ppad

        @pl.when(valid)
        def _():
            assign_ref[...] = jnp.where(acol == i, j, assign_ref[...])
            kill = jnp.logical_or(row == i, col == j)
            benefit[...] = jnp.where(kill, _NEG, m)

        return 0

    jax.lax.fori_loop(0, g, body, 0)


def greedy_match_pallas_batched(
    gt_boxes: jnp.ndarray,
    num_gt: jnp.ndarray,
    priors: jnp.ndarray,
    interpret=None,
) -> jnp.ndarray:
    """Batched greedy IoU matching: ``gt_boxes [B, G, 4]``, ``num_gt [B]``,
    shared ``priors [P, 4]`` → assignment ``[B, G]`` int32 (−1 = padded gt).
    Contract of ``vmap(ops.matching.greedy_match)`` over the pure-IoU
    benefit. G ≤ 128."""
    b, g = gt_boxes.shape[:2]
    p = priors.shape[0]
    if g > 128:
        raise ValueError(f"kernel supports up to 128 gt boxes, got {g}")
    gpad = _round_up(max(g, 8), 8)
    ppad = _round_up(max(p, 128), 128)
    apad = 128

    gt_pad = jnp.zeros((b * gpad, 128), jnp.float32)
    gt_rows = gt_boxes.astype(jnp.float32).reshape(b * g, 4)
    row_ids = (
        jnp.arange(b)[:, None] * gpad + jnp.arange(g)[None, :]
    ).reshape(-1)
    gt_pad = gt_pad.at[row_ids, :4].set(gt_rows)

    pri = jnp.zeros((4, ppad), jnp.float32)
    pri = pri.at[:, :p].set(priors.astype(jnp.float32).T)

    kernel = functools.partial(
        _match_kernel, g=g, gpad=gpad, p=p, ppad=ppad, apad=apad
    )
    assign = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((gpad, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ppad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Mosaic needs >=8 sublanes per VMEM block: each instance owns an
        # 8-row tile, every row holding the same assignment vector.
        out_specs=pl.BlockSpec((8, apad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * b, apad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((gpad, ppad), jnp.float32)],
        interpret=should_interpret(interpret),
    )(num_gt.astype(jnp.int32).reshape(b), gt_pad, pri)
    return assign.reshape(b, 8, apad)[:, 0, :g]


def greedy_match_pallas(
    gt_boxes: jnp.ndarray,
    num_gt: jnp.ndarray,
    priors: jnp.ndarray,
    interpret=None,
) -> jnp.ndarray:
    """Single-image greedy IoU matching (B=1 case of the batched kernel).
    Contract of ``ops.matching.greedy_match`` over the pure-IoU benefit."""
    return greedy_match_pallas_batched(
        gt_boxes[None],
        jnp.asarray(num_gt, jnp.int32).reshape(1),
        priors,
        interpret=interpret,
    )[0]
