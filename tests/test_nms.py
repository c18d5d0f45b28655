"""NMS vs numpy oracle and TF's non_max_suppression (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multibox_tpu.ops.nms import nms as nms_fn, batched_nms
from tests.conftest import random_boxes
from tests.test_boxes import np_iou_matrix

# Fast tier: no 8-device e2e state, runs in the `-m smoke` subset.
pytestmark = pytest.mark.smoke


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


# ---- Gaussian soft-NMS (arXiv:1704.04503) ----

def test_soft_nms_matches_numpy_oracle(rng):
    """jnp soft-NMS vs a direct numpy transcription of the paper's
    Gaussian re-scoring loop."""
    import numpy as np

    import jax

    from multibox_tpu.ops.nms import soft_nms

    def oracle(boxes, scores, k, sigma, thr):
        boxes = boxes.copy()
        scores = scores.astype(np.float64).copy()
        live = np.where(scores >= thr, scores, -np.inf)
        out_idx, out_scores = [], []
        for _ in range(k):
            b = int(np.argmax(live))
            if not live[b] >= thr:
                break
            out_idx.append(b)
            out_scores.append(live[b])
            # decay all remaining by overlap with the pick
            yx0 = np.maximum(boxes[:, :2], boxes[b, :2])
            yx1 = np.minimum(boxes[:, 2:], boxes[b, 2:])
            inter = np.prod(np.clip(yx1 - yx0, 0, None), axis=1)
            area = np.prod(boxes[:, 2:] - boxes[:, :2], axis=1)
            union = area + area[b] - inter
            iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0)
            live = live * np.exp(-(iou ** 2) / sigma)
            live[b] = -np.inf
        return out_idx, out_scores

    n = 64
    boxes = np.sort(
        rng.uniform(0, 1, (n, 2, 2)).astype(np.float32), axis=1
    ).reshape(n, 4)
    scores = rng.uniform(0, 1, (n,)).astype(np.float32)
    for sigma, thr in ((0.5, 0.001), (0.1, 0.3)):
        sb, ss, si, nv = jax.jit(
            lambda b, s: soft_nms(jnp.array(b), jnp.array(s), 16, sigma, thr)
        )(boxes, scores)
        oi, osc = oracle(boxes, scores, 16, sigma, thr)
        nv = int(nv)
        assert si[:nv].tolist() == oi
        np.testing.assert_allclose(np.asarray(ss)[:nv], osc, rtol=1e-4)
        assert (np.asarray(si)[nv:] == -1).all()


def test_soft_nms_keeps_occluded_true_positive():
    """The motivating case: two heavily-overlapping objects. Hard NMS at
    iou 0.5 keeps one; soft-NMS keeps both with the second decayed."""
    import numpy as np

    from multibox_tpu.ops.nms import nms, soft_nms

    boxes = jnp.array([[0.1, 0.1, 0.5, 0.5], [0.15, 0.15, 0.55, 0.55]])
    scores = jnp.array([0.9, 0.8])
    _, _, _, nv_hard = nms(boxes, scores, 4, iou_threshold=0.5)
    sb, ss, si, nv_soft = soft_nms(boxes, scores, 4, sigma=0.5,
                                   score_threshold=0.01)
    assert int(nv_hard) == 1
    assert int(nv_soft) == 2
    assert float(ss[1]) < 0.8  # second survives, decayed
    assert si[:2].tolist() == [0, 1]


def test_batched_soft_nms_class_isolation():
    """Per-class soft-NMS: identical boxes of DIFFERENT classes must not
    decay each other (coordinate-offset islands)."""
    import numpy as np

    from multibox_tpu.ops.nms import batched_soft_nms

    box = [0.2, 0.2, 0.6, 0.6]
    boxes = jnp.array([[box, box]])
    scores = jnp.array([[0.9, 0.8]])
    classes = jnp.array([[0, 1]], dtype=jnp.int32)
    _, ss, _, nv = batched_soft_nms(boxes, scores, 4, sigma=0.5,
                                    score_threshold=0.01,
                                    class_ids=classes)
    assert int(nv[0]) == 2
    np.testing.assert_allclose(np.asarray(ss[0, :2]), [0.9, 0.8], rtol=1e-6)
