"""Pallas TPU kernels: bbox encode/decode (+ clip), batched.

Semantics identical to ``ops.boxes.encode_boxes``/``decode_boxes`` (the
MultiBox residual parameterization) — these are elementwise-tiny ops, but
the north star calls for them as kernels and fusing decode+clip in one
VMEM pass avoids an extra HBM round trip when post-processing huge prior
sets. Layout: [N, 4] tensors tiled (8, 128)-style as [N4pad] planes like
the NMS kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multibox_tpu.ops.pallas import should_interpret


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _decode_kernel(off_ref, pri_ref, out_ref, *, clip: bool):
    box = pri_ref[...] + off_ref[...]
    if clip:
        box = jnp.clip(box, 0.0, 1.0)
    out_ref[...] = box


def _encode_kernel(gt_ref, pri_ref, out_ref):
    out_ref[...] = gt_ref[...] - pri_ref[...]


def _run_elementwise(kernel, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2-in/1-out elementwise kernel over [..., 4] box tensors."""
    shape = a.shape
    n = 1
    for s in shape:
        n *= s
    npad = _round_up(max(n, 1024), 1024)
    af = jnp.pad(a.astype(jnp.float32).reshape(-1), (0, npad - n))
    bf = jnp.pad(b.astype(jnp.float32).reshape(-1), (0, npad - n))
    # 2D (rows, 128) layout for clean tiling.
    rows = npad // 128
    af = af.reshape(rows, 128)
    bf = bf.reshape(rows, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=should_interpret(),
    )(af, bf)
    return out.reshape(-1)[:n].reshape(shape)


def decode_boxes_pallas(
    offsets: jnp.ndarray, priors: jnp.ndarray, clip: bool = True
) -> jnp.ndarray:
    """``prior + offset`` (+ clip) in one fused VMEM pass. Broadcasts priors
    over leading batch dims like the jnp version."""
    priors_b = jnp.broadcast_to(priors, offsets.shape)
    return _run_elementwise(
        functools.partial(_decode_kernel, clip=clip), offsets, priors_b
    )


def encode_boxes_pallas(gt: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    priors_b = jnp.broadcast_to(priors, gt.shape)
    return _run_elementwise(_encode_kernel, gt, priors_b)
