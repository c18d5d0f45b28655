"""MobileNetV2 backbone family: shapes, detector integration, training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.models.mobilenet import MobileNetV2
from tests.conftest import random_boxes


def test_endpoint_shapes():
    model = MobileNetV2(compute_dtype=jnp.float32)
    x = jnp.zeros((1, 224, 224, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    eps = model.apply(v, x)
    assert eps["Stage_2"].shape == (1, 28, 28, 32)   # stride 8
    assert eps["Stage_4"].shape == (1, 14, 14, 96)   # stride 16
    assert eps["Stage_6"].shape == (1, 7, 7, 320)    # stride 32
    assert eps["Final"].shape == (1, 7, 7, 1280)
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 2e6 < n < 4e6, n  # MobileNetV2 1.0: ~2.2M backbone params


def test_width_multiplier():
    model = MobileNetV2(width=0.5, compute_dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    full = MobileNetV2(width=1.0, compute_dtype=jnp.float32)
    vf = full.init(jax.random.PRNGKey(0), x)
    nf = sum(p.size for p in jax.tree.leaves(vf["params"]))
    assert n < nf * 0.6


def test_detector_with_mobilenet(rng):
    cfg = Config(
        input_size=96, backbone="mobilenet_v2", num_priors=16,
        compute_dtype="float32", max_detections=5, detect_score_threshold=0.0,
    )
    from multibox_tpu.inference import build_model, make_detect_fn

    priors = jnp.asarray(np.sort(
        rng.uniform(0.05, 0.95, (16, 2, 2)).astype(np.float32), axis=1
    ).reshape(16, 4))
    model = build_model(cfg, 16)
    x = jnp.zeros((2, 96, 96, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(v, x)
    assert loc.shape == (2, 16, 4)
    assert conf.shape == (2, 16)
    detect = make_detect_fn(cfg, priors, use_ema=False)
    out = detect(dict(v), x)
    assert out["boxes"].shape == (2, 5, 4)


@pytest.mark.slow
def test_mobilenet_train_step_learns(rng):
    cfg = Config(
        input_size=96, backbone="mobilenet_v2", num_priors=8,
        compute_dtype="float32", batch_size=2, max_num_bboxes=3,
        initial_learning_rate=0.01, num_epochs_per_decay=1000.0,
        num_train_examples=2, bn_momentum=0.9,
    )
    from multibox_tpu.inference import build_model
    from multibox_tpu.train import create_train_state, make_train_step

    priors = jnp.asarray(np.sort(
        rng.uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32), axis=1
    ).reshape(8, 4))
    model = build_model(cfg, 8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 8)
    step = jax.jit(make_train_step(cfg, model, priors))
    batch = {
        "images": jnp.asarray(rng.normal(0, 0.5, (2, 96, 96, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.stack([random_boxes(rng, 3)] * 2)),
        "num_boxes": jnp.asarray([2, 1], np.int32),
    }
    state, m0 = step(state, batch)
    for _ in range(40):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"]) * 0.7
