"""NMS vs numpy oracle and TF's non_max_suppression (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multibox_tpu.ops.nms import nms as nms_fn, batched_nms
from tests.conftest import random_boxes
from tests.test_boxes import np_iou_matrix


def np_nms(boxes, scores, max_outputs, iou_threshold, score_threshold=-np.inf):
    """Numpy greedy-NMS oracle."""
    order = np.argsort(-scores, kind="stable")
    selected = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    iou = np_iou_matrix(boxes, boxes)
    for i in order:
        if suppressed[i] or scores[i] < score_threshold:
            continue
        selected.append(i)
        if len(selected) == max_outputs:
            break
        suppressed |= iou[i] > iou_threshold
    return selected


@pytest.mark.parametrize("P,k,thresh", [(50, 10, 0.5), (128, 32, 0.3), (20, 20, 0.7)])
def test_nms_vs_numpy_oracle(rng, P, k, thresh):
    boxes = random_boxes(rng, P)
    scores = rng.uniform(0, 1, size=P).astype(np.float32)
    sel_b, sel_s, sel_i, nv = nms_fn(
        jnp.array(boxes), jnp.array(scores), k, iou_threshold=thresh
    )
    want = np_nms(boxes, scores, k, thresh)
    got = [i for i in np.asarray(sel_i).tolist() if i >= 0]
    assert got == want
    assert int(nv) == len(want)
    np.testing.assert_allclose(np.asarray(sel_b)[: len(want)], boxes[want], atol=1e-6)


def test_nms_score_threshold(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.uniform(0, 1, size=30).astype(np.float32)
    sel_b, sel_s, sel_i, nv = nms_fn(
        jnp.array(boxes), jnp.array(scores), 30, iou_threshold=0.5, score_threshold=0.6
    )
    got = np.asarray(sel_s)[: int(nv)]
    assert (got >= 0.6).all()
    want = np_nms(boxes, scores, 30, 0.5, score_threshold=0.6)
    assert int(nv) == len(want)


def test_nms_vs_tensorflow(rng):
    tf = pytest.importorskip("tensorflow")
    boxes = random_boxes(rng, 100)
    scores = rng.uniform(0, 1, size=100).astype(np.float32)
    tf_idx = tf.image.non_max_suppression(
        boxes, scores, max_output_size=25, iou_threshold=0.5
    ).numpy()
    _, _, sel_i, nv = nms_fn(
        jnp.array(boxes), jnp.array(scores), 25, iou_threshold=0.5
    )
    got = np.asarray(sel_i)[: int(nv)]
    np.testing.assert_array_equal(got, tf_idx)


def test_nms_empty_padding():
    boxes = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.0, 0.0, 0.5, 0.5]])
    scores = jnp.array([0.9, 0.8])
    sel_b, sel_s, sel_i, nv = nms_fn(boxes, scores, 5, iou_threshold=0.5)
    assert int(nv) == 1  # identical boxes suppress each other
    assert np.asarray(sel_i).tolist() == [0, -1, -1, -1, -1]
    np.testing.assert_allclose(np.asarray(sel_s)[1:], -1.0)
    np.testing.assert_allclose(np.asarray(sel_b)[1:], 0.0)


def test_batched_nms(rng):
    B, P, k = 3, 40, 8
    boxes = np.stack([random_boxes(rng, P) for _ in range(B)])
    scores = rng.uniform(0, 1, size=(B, P)).astype(np.float32)
    sel_b, sel_s, sel_i, nv = batched_nms(
        jnp.array(boxes), jnp.array(scores), k, iou_threshold=0.5
    )
    assert sel_b.shape == (B, k, 4)
    for b in range(B):
        want = np_nms(boxes[b], scores[b], k, 0.5)
        got = [i for i in np.asarray(sel_i[b]).tolist() if i >= 0]
        assert got == want


def test_batched_nms_per_class(rng):
    # Identical overlapping boxes in different classes must NOT suppress
    # each other.
    boxes = np.tile(random_boxes(rng, 1), (4, 1)).astype(np.float32)[None]
    scores = np.array([[0.9, 0.8, 0.7, 0.6]], dtype=np.float32)
    class_ids = np.array([[0, 0, 1, 1]], dtype=np.int32)
    _, sel_s, sel_i, nv = batched_nms(
        jnp.array(boxes),
        jnp.array(scores),
        4,
        iou_threshold=0.5,
        class_ids=jnp.array(class_ids),
    )
    assert int(nv[0]) == 2  # one survivor per class
    got = sorted(np.asarray(sel_i[0])[: 2].tolist())
    assert got == [0, 2]
