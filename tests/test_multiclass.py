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


def test_ssd_dense_matching():
    """multi_match_iou (SSD §2.2): every prior with best-gt IoU ≥ thr joins
    the bipartite winner as a positive, with correct loc/cls targets."""
    gt = jnp.array([[0.2, 0.2, 0.6, 0.6]])
    priors = jnp.array([
        [0.2, 0.2, 0.6, 0.6],    # exact → bipartite winner
        [0.22, 0.22, 0.62, 0.62],  # IoU ≈ 0.82 → dense extra
        [0.4, 0.4, 0.8, 0.8],    # IoU ≈ 0.14 → stays negative
        [0.8, 0.8, 0.9, 0.9],    # no overlap
    ])
    num_gt = jnp.int32(1)

    a, pg, conf_t, loc_t, matched = matching.match_priors(
        gt, num_gt, priors, multi_match_iou=0.5
    )
    assert np.asarray(pg).tolist() == [0, 0, -1, -1]
    assert np.asarray(conf_t).tolist() == [1.0, 1.0, 0.0, 0.0]
    np.testing.assert_allclose(
        np.asarray(loc_t[1]), np.asarray(gt[0] - priors[1]), atol=1e-6
    )
    # without multi-match: 1-to-1 only
    a0, pg0, conf_t0, _, _ = matching.match_priors(gt, num_gt, priors)
    assert np.asarray(pg0).tolist() == [0, -1, -1, -1]

    # multi-class loss: num_pos counts dense positives, cls target gathers
    conf = jnp.zeros((1, 4, 3))
    loc = jnp.zeros((1, 4, 4))
    _, m = multibox_loss(
        loc, conf, gt[None], jnp.array([1], jnp.int32), priors,
        gt_labels=jnp.array([[2]], jnp.int32), multi_match_iou=0.5,
    )
    assert float(m["num_pos"]) == 2.0


def test_dense_matching_respects_padding(rng):
    """Padded gt rows must never create dense positives."""
    gt = jnp.array([[0.2, 0.2, 0.6, 0.6], [0.2, 0.2, 0.6, 0.6]])
    priors = jnp.array([[0.2, 0.2, 0.6, 0.6], [0.21, 0.21, 0.61, 0.61]])
    # second gt row is PADDING (identical box, but num_gt=1)
    _, pg, conf_t, _, _ = matching.match_priors(
        gt, jnp.int32(1), priors, multi_match_iou=0.5
    )
    assert np.asarray(pg).tolist() == [0, 0]
    assert np.asarray(conf_t).sum() == 2.0


def test_postprocess_per_class_sweep_emits_multiple_classes():
    """One prior scoring high on TWO classes: the per-class sweep (default)
    must emit both as separate detections; the argmax approximation
    (per_class_detect=False) can only emit the winner — the measured AP
    depressor this sweep removes (VERDICT round-2 item #2)."""
    from dataclasses import replace

    from multibox_tpu.inference import postprocess

    cfg = Config(num_priors=2, num_classes=3, max_detections=8,
                 detect_score_threshold=0.05, use_pallas=False)
    priors = jnp.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]])
    loc = jnp.zeros((1, 2, 4))
    conf = jnp.array([[[3.0, 2.5, -5.0], [-5.0, -5.0, -5.0]]])

    det = postprocess(loc, conf, priors, cfg)  # default = per-class sweep
    n = int(det["num"][0])
    classes = set(np.asarray(det["classes"][0, :n]).tolist())
    assert {0, 1} <= classes, classes
    # both candidates decode to the same prior box
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(det["boxes"][0, i]), np.asarray(priors[0]), atol=1e-6
        )

    det2 = postprocess(loc, conf, priors, replace(cfg, per_class_detect=False))
    n2 = int(det2["num"][0])
    classes2 = set(np.asarray(det2["classes"][0, :n2]).tolist())
    assert classes2 == {0}, classes2


def test_postprocess_per_class_candidate_budget(rng):
    """detect_candidates < P·C: top-k pruning keeps the highest scores and
    output shapes stay static."""
    from multibox_tpu.inference import postprocess

    B, P, C = 2, 16, 4
    cfg = Config(num_priors=P, num_classes=C, max_detections=6,
                 detect_candidates=10, detect_score_threshold=0.0,
                 use_pallas=False)
    priors = jnp.asarray(random_boxes(rng, P))
    loc = jnp.zeros((B, P, 4))
    conf = jnp.asarray(rng.normal(0, 2, (B, P, C)).astype(np.float32))
    det = jax.jit(lambda l, c: postprocess(l, c, priors, cfg))(loc, conf)
    assert det["boxes"].shape == (B, 6, 4)
    assert det["classes"].shape == (B, 6)
    # top detection = global max over the [P, C] score grid
    probs = 1 / (1 + np.exp(-np.asarray(conf)))
    for b in range(B):
        p_best, c_best = np.unravel_index(np.argmax(probs[b]), (P, C))
        assert int(det["classes"][b, 0]) == c_best
        np.testing.assert_allclose(
            np.asarray(det["boxes"][b, 0]), np.asarray(priors[p_best]),
            atol=1e-6,
        )


def test_pipeline_label_offset_and_validation(tmp_path, rng):
    """1-based labels (VOC/COCO convention) must fail loudly without
    label_offset and come out 0-based with it (VERDICT round-2 item #5)."""
    from multibox_tpu.data.example_proto import build_detection_example
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.data.tfrecord import TFRecordWriter

    path = str(tmp_path / "t.tfrecord")
    canvas = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    with TFRecordWriter(path) as w:
        for i, labels in enumerate([[1, 3], [2]]):
            boxes = random_boxes(rng, len(labels))
            w.write(build_detection_example(
                b"", f"img{i}", boxes, labels=labels, raw_canvas=canvas,
            ))

    bad = DetectionDataset([path], batch_size=2, canvas_size=32,
                           max_num_bboxes=4, num_classes=3)
    with pytest.raises(ValueError, match="label_offset"):
        list(bad)

    good = DetectionDataset([path], batch_size=2, canvas_size=32,
                            max_num_bboxes=4, num_classes=3, label_offset=1)
    batch = next(iter(good))
    assert batch["labels"][0, :2].tolist() == [0, 2]
    assert batch["labels"][1, :1].tolist() == [1]


def test_loss_num_bad_labels_metric(rng):
    """Out-of-range labels at ACTIVE gt rows are counted; padded rows are
    not (defense-in-depth tripwire behind the host pipeline check)."""
    P, C = 10, 3
    priors = jnp.asarray(random_boxes(rng, P))
    gt = jnp.asarray(np.stack([random_boxes(rng, 4)]))
    labels = jnp.array([[0, 5, 1, 7]], jnp.int32)  # idx1 bad-active, idx3 padded
    conf = jnp.zeros((1, P, C))
    loc = jnp.zeros((1, P, 4))
    _, m = multibox_loss(
        loc, conf, gt, jnp.array([3], jnp.int32), priors, gt_labels=labels,
    )
    assert float(m["num_bad_labels"]) == 1.0


def test_focal_loss_formula(rng):
    from multibox_tpu.train.loss import focal_sigmoid_bce, optax_sigmoid_bce

    logits = jnp.asarray(rng.normal(0, 3, (50,)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=50) > 0.5).astype(np.float32))
    got = np.asarray(focal_sigmoid_bce(logits, labels, 2.0, 0.25))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    z = np.asarray(labels)
    bce = -(z * np.log(p) + (1 - z) * np.log(1 - p))
    p_t = z * p + (1 - z) * (1 - p)
    a_t = z * 0.25 + (1 - z) * 0.75
    want = a_t * (1 - p_t) ** 2 * bce
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # γ=0, α=0.5 → exactly half the plain BCE
    got0 = np.asarray(focal_sigmoid_bce(logits, labels, 0.0, 0.5))
    np.testing.assert_allclose(
        got0, 0.5 * np.asarray(optax_sigmoid_bce(logits, labels)), rtol=1e-5
    )


def test_multibox_loss_focal_descends(rng):
    """Focal conf loss: finite grads, and a step of gradient descent on the
    logits reduces the loss (sanity that the option is trainable)."""
    B, P, G, C = 2, 16, 3, 4
    priors = jnp.asarray(random_boxes(rng, P))
    gt = jnp.asarray(np.stack([random_boxes(rng, G) for _ in range(B)]))
    labels = jnp.asarray(rng.integers(0, C, (B, G)).astype(np.int32))
    num_gt = jnp.array([3, 2], jnp.int32)
    conf = jnp.asarray(rng.normal(0, 1, (B, P, C)).astype(np.float32))
    loc = jnp.asarray(rng.normal(0, 0.05, (B, P, 4)).astype(np.float32))

    def f(conf):
        total, _ = multibox_loss(
            loc, conf, gt, num_gt, priors, hard_negative_ratio=0.0,
            gt_labels=labels, conf_loss="focal",
        )
        return total

    l0 = float(f(conf))
    g = jax.grad(f)(conf)
    assert np.isfinite(np.asarray(g)).all()
    assert float(f(conf - 0.5 * g)) < l0


def test_lr_schedule_floor_and_cosine():
    from multibox_tpu.train.state import make_lr_schedule

    cfg = Config(initial_learning_rate=0.01, learning_rate_decay_factor=0.5,
                 num_epochs_per_decay=1.0, num_train_examples=32,
                 batch_size=32, min_learning_rate=0.004)
    s = make_lr_schedule(cfg)  # staircase decays every step here
    assert float(s(0)) == pytest.approx(0.01)
    assert float(s(1)) == pytest.approx(0.005)
    assert float(s(2)) == pytest.approx(0.004)  # floored
    assert float(s(50)) == pytest.approx(0.004)

    cfg = Config(lr_schedule="cosine", initial_learning_rate=0.01,
                 warmup_steps=10, max_number_of_steps=110,
                 min_learning_rate=0.001)
    s = make_lr_schedule(cfg)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(0.01)
    assert float(s(60)) < 0.01
    assert float(s(110)) == pytest.approx(0.001, rel=1e-3)


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


def test_eval_config_per_host_batch(monkeypatch):
    """cfg.batch_size is the GLOBAL train batch; eval_config scales it to
    the per-host share, kept divisible by the local device count (ADVICE
    round-3 medium: periodic eval on a pod must not run at process_count x
    the per-host batch)."""
    import multibox_tpu.train.loop as loop_mod

    cfg = Config(batch_size=32)
    # Single process: unchanged (and the SAME object, no needless rebuild).
    assert loop_mod.eval_config(cfg) is cfg

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    out = loop_mod.eval_config(cfg)
    assert out.batch_size == 8  # 32 global / 4 hosts, divisible by 8? no ->
    # 8 local devices on the fake mesh: 8 % 8 == 0, stays 8.
    assert out.batch_size % len(jax.local_devices()) == 0

    # Non-divisible per-host share rounds down to a device multiple but
    # never below the device count.
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    out = loop_mod.eval_config(cfg)
    assert out.batch_size == 8  # 32//3=10 -> rounded to 8 local devices


def test_in_training_eval_emits_per_class_map(tmp_path, rng):
    """Periodic in-training eval on a multi-class run must log the
    per-class protocol (eval/mAP@0.5) alongside the class-agnostic AP —
    the round-2 plateau hid behind a healthy class-agnostic AP@0.5
    (VERDICT round-3 item #6)."""
    import json
    import os

    from multibox_tpu.cli.train import main
    from multibox_tpu.data.example_proto import build_detection_example
    from multibox_tpu.data.tfrecord import TFRecordWriter
    from multibox_tpu.priors import save_priors

    path = str(tmp_path / "t.tfrecord")
    canvas = 80
    with TFRecordWriter(path) as w:
        for i in range(4):
            img = rng.integers(0, 255, (canvas, canvas, 3)).astype(np.uint8)
            boxes = random_boxes(rng, 2)
            w.write(build_detection_example(
                b"", f"img{i}", boxes, labels=[1 + (i % 3), 1 + ((i + 1) % 3)],
                raw_canvas=img,
            ))
    priors_path = str(tmp_path / "p.pkl")
    save_priors(np.asarray(random_boxes(rng, 16), np.float32), priors_path)
    cfg_path = str(tmp_path / "mc.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "INPUT_SIZE: 75\nBATCH_SIZE: 2\nMAX_NUM_BBOXES: 4\n"
            "num_classes: 3\nlabel_offset: 1\n"
            "steps_per_host_transfer: 1\n"
        )
    logdir = str(tmp_path / "logs")
    assert main([
        "--tfrecords", path, "--priors", priors_path,
        "--logdir", logdir, "--config", cfg_path,
        "--no_mesh", "--max_number_of_steps", "2",
        "--eval_tfrecords", path, "--eval_every_steps", "2",
    ]) == 0
    lines = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    eval_lines = [l for l in lines if "eval/mAP@0.5" in l]
    assert eval_lines, "per-class mAP missing from in-training eval"
    assert "eval/AP@0.5/class_0" in eval_lines[-1]
    assert "eval/mAP@[.5:.95]/per_class" in eval_lines[-1]
    assert np.isfinite(eval_lines[-1]["eval/mAP@0.5"])
