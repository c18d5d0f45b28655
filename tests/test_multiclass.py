"""Multi-class training path (BASELINE configs[4] COCO-style): labels
through augmentation, matching targets, multi-class loss, per-class eval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.ops import matching
from multibox_tpu.train.loss import multibox_loss
from tests.conftest import random_boxes


def test_matching_targets_with_labels(rng):
    gt = jnp.array(random_boxes(rng, 3))
    priors = jnp.array(random_boxes(rng, 10))
    assignment = jnp.array([4, 7, -1], jnp.int32)
    labels = jnp.array([2, 5, 9], jnp.int32)
    conf_t, loc_t, matched, cls_t = matching.matching_targets(
        assignment, gt, priors, gt_labels=labels
    )
    cls_t = np.asarray(cls_t)
    assert cls_t[4] == 2 and cls_t[7] == 5
    assert (np.delete(cls_t, [4, 7]) == -1).all()


def test_multiclass_loss_hand_case():
    # 1 image, 2 priors, 1 gt of class 1 exactly on prior 0, C=3.
    priors = jnp.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]])
    gt = jnp.array([[[0.1, 0.1, 0.4, 0.4]]])
    labels = jnp.array([[1]], jnp.int32)
    conf = jnp.array([[[0.0, 2.0, -1.0], [-2.0, -2.0, -2.0]]])
    loc = jnp.zeros((1, 2, 4))
    total, m = multibox_loss(
        loc, conf, gt, jnp.array([1], jnp.int32), priors,
        hard_negative_ratio=0.0, gt_labels=labels,
    )
    sig = lambda x: 1 / (1 + np.exp(-x))
    want_pos = -np.log(sig(2.0))
    # negatives: prior0 classes 0,2 and prior1 all classes
    want_neg = (-np.log(1 - sig(0.0)) - np.log(1 - sig(-1.0))
                + 3 * -np.log(1 - sig(-2.0)))
    assert float(m["loss_conf"]) == pytest.approx(want_pos + want_neg, rel=1e-4)
    assert float(m["loss_loc"]) == pytest.approx(0.0, abs=1e-7)


def test_multiclass_loss_grads_and_mining(rng):
    B, P, G, C = 2, 20, 4, 6
    priors = jnp.array(random_boxes(rng, P))
    gt = jnp.array(np.stack([random_boxes(rng, G) for _ in range(B)]))
    labels = jnp.array(rng.integers(0, C, (B, G)).astype(np.int32))
    num_gt = jnp.array([4, 2], jnp.int32)
    conf = jnp.array(rng.normal(0, 1, (B, P, C)).astype(np.float32))
    loc = jnp.array(rng.normal(0, 0.05, (B, P, 4)).astype(np.float32))

    def f(loc, conf):
        total, _ = multibox_loss(
            loc, conf, gt, num_gt, priors, hard_negative_ratio=3.0,
            gt_labels=labels,
        )
        return total

    g1, g2 = jax.grad(f, argnums=(0, 1))(loc, conf)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    _, m = multibox_loss(loc, conf, gt, num_gt, priors,
                         hard_negative_ratio=3.0, gt_labels=labels)
    assert float(m["num_pos"]) == 6.0
    assert float(m["num_neg_kept"]) == pytest.approx(18.0)


def test_augment_permutes_labels_with_boxes(rng):
    cfg = Config(input_size=32, max_num_bboxes=4, color_distort=False,
                 random_flip=False, crop_min_object_covered=1.0,
                 crop_min_area=0.3, crop_max_area=0.6)
    from multibox_tpu.data.augment import augment_batch

    # Two boxes far apart; a tight crop keeps at most one.
    boxes = jnp.array([[[0.1, 0.1, 0.25, 0.25], [0.75, 0.75, 0.9, 0.9],
                        [0, 0, 0, 0], [0, 0, 0, 0]]])
    labels = jnp.array([[7, 3, 0, 0]], jnp.int32)
    images = jnp.zeros((1, 48, 48, 3), jnp.uint8)
    found = set()
    for s in range(12):
        _, nb, nn, nl = augment_batch(
            jax.random.PRNGKey(s), images, boxes,
            jnp.array([2], jnp.int32), cfg, labels=labels,
        )
        n = int(nn[0])
        for i in range(n):
            b = np.asarray(nb[0, i])
            l = int(nl[0, i])
            found.add(l)
            assert l in (7, 3)
    # across seeds both labels should have survived at least once
    assert found, "no boxes survived any crop"


def test_multiclass_train_step(rng):
    cfg = Config(input_size=75, num_priors=8, num_classes=4,
                 compute_dtype="float32", max_num_bboxes=3,
                 num_train_examples=2, batch_size=2)
    from multibox_tpu.inference import build_model
    from multibox_tpu.train import create_train_state, make_train_step

    priors = jnp.array(np.sort(
        rng.uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32), axis=1
    ).reshape(8, 4))
    model = build_model(cfg, 8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 8)
    step = jax.jit(make_train_step(cfg, model, priors))
    batch = {
        "images": jnp.asarray(rng.normal(0, 0.5, (2, 75, 75, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.stack([random_boxes(rng, 3)] * 2)),
        "num_boxes": jnp.asarray([3, 1], np.int32),
        "labels": jnp.asarray(rng.integers(0, 4, (2, 3)).astype(np.int32)),
    }
    state, m0 = step(state, batch)
    for _ in range(15):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_per_class_eval():
    from multibox_tpu.evaluate import evaluate_detections_per_class

    gt_boxes = {"a": np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]])}
    gt_labels = {"a": np.array([1, 2])}
    dets = [{
        "image_id": "a",
        "boxes": np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]]),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([1, 1]),  # second one wrong class
    }]
    m = evaluate_detections_per_class(dets, gt_boxes, gt_labels)
    assert m["AP@0.5/class_1"] == pytest.approx(1.0)
    assert m["AP@0.5/class_2"] == pytest.approx(0.0)
    assert m["mAP@0.5"] == pytest.approx(0.5)
