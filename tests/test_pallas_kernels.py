"""Pallas kernels vs their jnp reference implementations, interpret mode
(SURVEY.md §4 "Kernel tests"). Real-TPU execution is exercised separately
by bench.py / the verify drive on hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.ops import boxes as box_ops
from multibox_tpu.ops import matching as matching_ops
from multibox_tpu.ops.nms import _nms_jnp, batched_nms
from multibox_tpu.ops.pallas.box_kernel import (
    decode_boxes_pallas,
    encode_boxes_pallas,
)
from multibox_tpu.ops.pallas.match_kernel import greedy_match_pallas
from multibox_tpu.ops.pallas.nms_kernel import nms_pallas
from tests.conftest import random_boxes


@pytest.mark.parametrize("P,k", [(50, 10), (200, 32), (128, 128)])
def test_nms_kernel_matches_jnp(rng, P, k):
    boxes = jnp.array(random_boxes(rng, P))
    scores = jnp.array(rng.uniform(0, 1, P).astype(np.float32))
    want = _nms_jnp(boxes, scores, k, 0.5, 0.1)
    got = nms_pallas(boxes, scores, k, 0.5, 0.1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))  # idx
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)
    assert int(got[3]) == int(want[3])


def test_nms_kernel_no_threshold(rng):
    boxes = jnp.array(random_boxes(rng, 40))
    scores = jnp.array(rng.uniform(0, 1, 40).astype(np.float32))
    want = _nms_jnp(boxes, scores, 12, 0.3, -jnp.inf)
    got = nms_pallas(boxes, scores, 12, 0.3, -jnp.inf, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))


def test_decode_kernel_matches_jnp(rng):
    offsets = jnp.array(rng.normal(0, 0.05, (3, 77, 4)).astype(np.float32))
    priors = jnp.array(random_boxes(rng, 77))
    want = box_ops.decode_boxes(offsets, priors[None], clip=True)
    got = decode_boxes_pallas(offsets, priors[None], clip=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_encode_kernel_matches_jnp(rng):
    gt = jnp.array(random_boxes(rng, 33))
    priors = jnp.array(random_boxes(rng, 33))
    want = box_ops.encode_boxes(gt, priors)
    got = encode_boxes_pallas(gt, priors)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("G,P,num_gt", [(5, 40, 5), (8, 130, 3), (16, 256, 16)])
def test_match_kernel_matches_jnp(rng, G, P, num_gt):
    gt = jnp.array(random_boxes(rng, G))
    priors = jnp.array(random_boxes(rng, P))
    benefit = matching_ops.compute_benefit(gt, priors)
    want = matching_ops.greedy_match(benefit, jnp.int32(num_gt))
    got = greedy_match_pallas(gt, jnp.int32(num_gt), priors, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_matmul_matches_jnp(rng):
    from multibox_tpu.ops.pallas.fused_matmul import fused_matmul_bias_relu

    x = jnp.array(rng.normal(0, 1, (70, 50)).astype(np.float32))
    w = jnp.array(rng.normal(0, 0.1, (50, 30)).astype(np.float32))
    b = jnp.array(rng.normal(0, 0.1, 30).astype(np.float32))
    want = jnp.maximum(x @ w + b, 0.0)
    got = fused_matmul_bias_relu(x, w, b, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # no-relu variant
    want2 = x @ w + b
    got2 = fused_matmul_bias_relu(x, w, b, False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4)


def test_fused_matmul_gradients(rng):
    from multibox_tpu.ops.pallas.fused_matmul import fused_matmul_bias_relu

    x = jnp.array(rng.normal(0, 1, (24, 16)).astype(np.float32))
    w = jnp.array(rng.normal(0, 0.1, (16, 8)).astype(np.float32))
    b = jnp.array(rng.normal(0, 0.1, 8).astype(np.float32))

    def f_pallas(x, w, b):
        return jnp.sum(fused_matmul_bias_relu(x, w, b, True) ** 2)

    def f_ref(x, w, b):
        return jnp.sum(jnp.maximum(x @ w + b, 0.0) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-3)


def test_nms_use_pallas_flag_routes(rng):
    """ops.nms.nms(use_pallas=True) must hit the kernel path (interpret mode
    engaged via force_tpu_interpret_mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from multibox_tpu.ops.nms import nms

    boxes = jnp.array(random_boxes(rng, 30))
    scores = jnp.array(rng.uniform(0, 1, 30).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = nms(boxes, scores, 8, use_pallas=True)
    want = nms(boxes, scores, 8, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))


@pytest.mark.parametrize("B,P,k", [(1, 50, 10), (3, 200, 32), (8, 128, 100), (11, 96, 16)])
def test_batched_nms_kernel_matches_jnp(rng, B, P, k):
    """The batch-native kernel (grid over batch tiles, images on sublanes)
    must match vmap of the jnp spec exactly — incl. non-multiple-of-8 B."""
    from multibox_tpu.ops.pallas.nms_kernel import nms_pallas_batched

    boxes = jnp.array(
        np.stack([random_boxes(rng, P) for _ in range(B)], axis=0)
    )
    scores = jnp.array(rng.uniform(0, 1, (B, P)).astype(np.float32))
    got = nms_pallas_batched(boxes, scores, k, 0.5, 0.1, interpret=True)
    want = jax.vmap(lambda b, s: _nms_jnp(b, s, k, 0.5, 0.1))(boxes, scores)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(want[3]))


def test_batched_nms_use_pallas_routes_batched_kernel(rng):
    """batched_nms(use_pallas=True) routes through the batch-native kernel
    (not a vmapped single-image call) and matches the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    B, P, k = 6, 64, 12
    boxes = jnp.array(
        np.stack([random_boxes(rng, P) for _ in range(B)], axis=0)
    )
    scores = jnp.array(rng.uniform(0, 1, (B, P)).astype(np.float32))
    class_ids = jnp.array(rng.integers(0, 3, (B, P)).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        got = batched_nms(
            boxes, scores, k, 0.5, 0.1, class_ids=class_ids, use_pallas=True
        )
    want = batched_nms(
        boxes, scores, k, 0.5, 0.1, class_ids=class_ids, use_pallas=False
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


@pytest.mark.parametrize("B,G,P", [(1, 5, 40), (4, 8, 130), (9, 16, 256)])
def test_batched_match_kernel_matches_jnp(rng, B, G, P):
    """Batched greedy-match kernel == vmap of the jnp spec, incl. padded
    gt rows and non-multiple-of-8 batch."""
    from multibox_tpu.ops.pallas.match_kernel import greedy_match_pallas_batched

    gt = jnp.array(np.stack([random_boxes(rng, G) for _ in range(B)]))
    priors = jnp.array(random_boxes(rng, P))
    num_gt = jnp.array(rng.integers(0, G + 1, B).astype(np.int32))
    got = greedy_match_pallas_batched(gt, num_gt, priors, interpret=True)
    want = jax.vmap(
        lambda g, n: matching_ops.greedy_match(
            matching_ops.compute_benefit(g, priors), n
        )
    )(gt, num_gt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_loss_use_pallas_matches_jnp(rng):
    """multibox_loss(use_pallas=True) (kernel matching, interpret mode)
    must equal the jnp path bit-for-bit given identical matching."""
    from jax.experimental.pallas import tpu as pltpu
    from multibox_tpu.train.loss import multibox_loss

    B, P, G = 4, 64, 6
    priors = jnp.array(random_boxes(rng, P))
    gt = jnp.array(np.stack([random_boxes(rng, G) for _ in range(B)]))
    num_gt = jnp.array(rng.integers(1, G + 1, B).astype(np.int32))
    loc = jnp.array(rng.normal(0, 0.05, (B, P, 4)).astype(np.float32))
    conf = jnp.array(rng.normal(0, 1, (B, P)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = multibox_loss(loc, conf, gt, num_gt, priors, use_pallas=True)
    want = multibox_loss(loc, conf, gt, num_gt, priors, use_pallas=False)
    np.testing.assert_allclose(
        float(got[0]), float(want[0]), rtol=1e-6
    )
    for k in want[1]:
        np.testing.assert_allclose(
            float(got[1][k]), float(want[1][k]), rtol=1e-6, err_msg=k
        )


def test_num_gt_dropped_metric(rng):
    """num_gt > P truncation must surface in the num_gt_dropped metric."""
    from multibox_tpu.train.loss import multibox_loss

    B, P, G = 2, 8, 12
    priors = jnp.array(random_boxes(rng, P))
    gt = jnp.array(np.stack([random_boxes(rng, G) for _ in range(B)]))
    num_gt = jnp.array([12, 3], np.int32)  # image 0 overflows P=8 by 4
    loc = jnp.array(rng.normal(0, 0.05, (B, P, 4)).astype(np.float32))
    conf = jnp.array(rng.normal(0, 1, (B, P)).astype(np.float32))
    _, metrics = multibox_loss(
        loc, conf, gt, num_gt, priors, matching="hungarian", use_pallas=False
    )
    assert float(metrics["num_gt_dropped"]) == 4.0
