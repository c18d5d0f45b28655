"""Box geometry vs numpy/manual oracles (SURVEY.md §4 unit tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multibox_tpu.ops import boxes as box_ops
from tests.conftest import random_boxes

# Fast tier: no 8-device e2e state, runs in the `-m smoke` subset.
pytestmark = pytest.mark.smoke


def np_iou_matrix(a, b):
    """Numpy oracle for pairwise IoU."""
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            iy = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            ix = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = iy * ix
            area_i = max(0.0, bi[2] - bi[0]) * max(0.0, bi[3] - bi[1])
            area_j = max(0.0, bj[2] - bj[0]) * max(0.0, bj[3] - bj[1])
            union = area_i + area_j - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_area():
    boxes = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.2, 0.2, 0.2, 0.9], [0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(box_ops.area(boxes), [0.25, 0.0, 1.0], atol=1e-7)


def test_iou_matrix_vs_oracle(rng):
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 7)
    got = np.asarray(box_ops.iou_matrix(jnp.array(a), jnp.array(b)))
    want = np_iou_matrix(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_identity(rng):
    a = random_boxes(rng, 5)
    got = np.asarray(box_ops.iou_matrix(jnp.array(a), jnp.array(a)))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)


def test_iou_degenerate_box_is_zero_not_nan():
    z = jnp.zeros((1, 4))
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    got = box_ops.iou_matrix(z, a)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(got, 0.0)
    got2 = box_ops.iou_matrix(z, z)
    np.testing.assert_allclose(got2, 0.0)


def test_iou_pairwise_matches_matrix_diag(rng):
    a = random_boxes(rng, 9)
    b = random_boxes(rng, 9)
    pair = np.asarray(box_ops.iou_pairwise(jnp.array(a), jnp.array(b)))
    mat = np.asarray(box_ops.iou_matrix(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(pair, np.diag(mat), atol=1e-6)


def test_multibox_encode_decode_roundtrip(rng):
    gt = random_boxes(rng, 20)
    priors = random_boxes(rng, 20)
    enc = box_ops.encode_boxes(jnp.array(gt), jnp.array(priors))
    dec = box_ops.decode_boxes(enc, jnp.array(priors), clip=False)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-6)
    # Spec: the offset IS gt - prior (parity-critical, SURVEY §2 C9).
    np.testing.assert_allclose(np.asarray(enc), gt - priors, atol=1e-6)


def test_ssd_encode_decode_roundtrip(rng):
    gt = random_boxes(rng, 20, min_size=0.05)
    priors = random_boxes(rng, 20, min_size=0.05)
    enc = box_ops.encode_boxes_ssd(jnp.array(gt), jnp.array(priors))
    dec = box_ops.decode_boxes_ssd(enc, jnp.array(priors), clip=False)
    # float32 log/exp roundtrip: a couple of ulps of slack
    np.testing.assert_allclose(np.asarray(dec), gt, atol=5e-5)


def test_flip_horizontal_involution(rng):
    b = random_boxes(rng, 10)
    flipped = box_ops.flip_boxes_horizontal(jnp.array(b))
    back = box_ops.flip_boxes_horizontal(flipped)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)
    f = np.asarray(flipped)
    # Still valid boxes, mirrored.
    assert (f[:, 3] >= f[:, 1]).all()
    np.testing.assert_allclose(f[:, 1], 1.0 - b[:, 3], atol=1e-6)


def test_clip():
    b = jnp.array([[-0.2, 0.5, 1.4, 0.9]])
    np.testing.assert_allclose(
        np.asarray(box_ops.clip_boxes(b)), [[0.0, 0.5, 1.0, 0.9]], atol=1e-7
    )
