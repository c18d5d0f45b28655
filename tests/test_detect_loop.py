"""run_detect_loop: the shared detect/eval host loop (VERDICT round-2 #3).

Chunked K-batch transfers + scanned device calls must produce byte-identical
results to the per-batch path, including the padded final partial batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.data.example_proto import build_detection_example
from multibox_tpu.data.pipeline import DetectionDataset
from multibox_tpu.data.tfrecord import TFRecordWriter
from multibox_tpu.inference import build_model, run_detect_loop
from tests.conftest import random_boxes


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(0)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="detect_loop_")
    path = f"{tmp}/t.tfrecord"
    with TFRecordWriter(path) as w:
        for i in range(13):
            canvas = rng.integers(0, 255, (75, 75, 3)).astype(np.uint8)
            boxes = random_boxes(rng, 2)
            w.write(build_detection_example(
                b"", f"img{i}", boxes, labels=[0, 0], raw_canvas=canvas,
            ))

    # batch_size=3 (not divisible by the 8 fake devices) forces the
    # single-device path where chunking applies.
    cfg = Config(input_size=75, num_priors=8, batch_size=3,
                 max_num_bboxes=4, compute_dtype="float32",
                 detect_score_threshold=0.0, max_detections=10)
    priors = jnp.asarray(np.sort(
        rng.uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32), axis=1
    ).reshape(8, 4))
    model = build_model(cfg, 8)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 75, 75, 3), jnp.float32))
    )()
    return cfg, path, priors, dict(variables)


def _dataset(cfg, path):
    return DetectionDataset([path], batch_size=cfg.batch_size,
                            canvas_size=cfg.input_size,
                            max_num_bboxes=cfg.max_num_bboxes)


def test_chunked_matches_per_batch(fixture):
    from dataclasses import replace

    cfg, path, priors, variables = fixture
    base = run_detect_loop(
        cfg, variables, _dataset(cfg, path), priors, use_ema=False,
    )
    # 13 images / batch 3 → 4 full batches + padded partial; chunk=4 runs
    # one scanned superbatch call + the partial per-batch.
    chunked_cfg = replace(cfg, steps_per_host_transfer=4)
    chunked = run_detect_loop(
        chunked_cfg, variables, _dataset(cfg, path), priors, use_ema=False,
    )
    assert len(base) == len(chunked) == 13
    for a, b in zip(base, chunked):
        assert a["image_id"] == b["image_id"]
        np.testing.assert_array_equal(a["classes"], b["classes"])
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-6)
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-6)


def test_score_threshold_filter(fixture):
    cfg, path, priors, variables = fixture
    all_dets = run_detect_loop(
        cfg, variables, _dataset(cfg, path), priors, use_ema=False,
    )
    thr = float(np.median(np.concatenate([r["scores"] for r in all_dets])))
    filtered = run_detect_loop(
        cfg, variables, _dataset(cfg, path), priors, use_ema=False,
        score_threshold=thr,
    )
    for r in filtered:
        assert (r["scores"] >= thr).all()
    n_all = sum(len(r["scores"]) for r in all_dets)
    n_f = sum(len(r["scores"]) for r in filtered)
    assert 0 < n_f < n_all


def test_soft_nms_postprocess_jits_and_fills_slots(rng):
    """nms_mode: soft runs inside the jitted postprocess with static
    shapes, in both class-agnostic and multi-class (per-class sweep)
    form."""
    from multibox_tpu.inference import postprocess

    P = 32
    priors = jnp.asarray(np.sort(
        rng.uniform(0, 1, (P, 2, 2)).astype(np.float32), axis=1
    ).reshape(P, 4))
    locs = jnp.zeros((2, P, 4), jnp.float32)

    cfg = Config(num_priors=P, max_detections=8, nms_mode="soft",
                 detect_score_threshold=0.05)
    conf = jnp.asarray(rng.normal(0, 2, (2, P)).astype(np.float32))
    out = jax.jit(lambda l, c: postprocess(l, c, priors, cfg))(locs, conf)
    assert out["boxes"].shape == (2, 8, 4)
    n = int(out["num"][0])
    assert 0 < n <= 8
    assert (np.asarray(out["scores"][0, :n]) >= 0.05).all()

    cfg_mc = Config(num_priors=P, max_detections=8, nms_mode="soft",
                    num_classes=3, detect_score_threshold=0.05,
                    detect_candidates=64)
    conf_mc = jnp.asarray(rng.normal(0, 2, (2, P, 3)).astype(np.float32))
    out = jax.jit(lambda l, c: postprocess(l, c, priors, cfg_mc))(locs, conf_mc)
    n = int(out["num"][0])
    assert 0 < n <= 8
    assert set(np.asarray(out["classes"][0, :n]).tolist()) <= {0, 1, 2}


def test_unknown_nms_mode_raises(rng):
    """A typo'd nms_mode must fail loudly, not silently fall back to hard
    NMS (that would poison quality A/Bs)."""
    from multibox_tpu.inference import postprocess

    priors = jnp.asarray(np.sort(
        rng.uniform(0, 1, (8, 2, 2)).astype(np.float32), axis=1
    ).reshape(8, 4))
    cfg = Config(num_priors=8, max_detections=4, nms_mode="Soft")
    with pytest.raises(ValueError, match="nms_mode"):
        postprocess(jnp.zeros((1, 8, 4)), jnp.zeros((1, 8)), priors, cfg)
