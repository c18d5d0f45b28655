"""SSD-style multi-scale extension end-to-end (BASELINE.json configs[3]):
grid priors aligned with conv heads, ssd box encoding, train + detect."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.priors import generate_priors_multiscale
from tests.conftest import random_boxes


@pytest.fixture(scope="module")
def ssd_setup():
    # input 75 → Mixed_5d 7x7, Mixed_6e 3x3, Mixed_7c 1x1 feature maps.
    cfg = Config(
        input_size=75,
        head_type="ssd",
        box_encoding="ssd",
        ssd_endpoints=("Mixed_5d", "Mixed_6e", "Mixed_7c"),
        ssd_priors_per_cell=4,
        batch_size=2,
        max_num_bboxes=3,
        compute_dtype="float32",
        initial_learning_rate=0.001,
        num_train_examples=2,
    )
    from multibox_tpu.inference import build_model

    model = build_model(cfg, 1)  # probe for feature sizes first
    # Probe endpoint sizes to build matching grid priors.
    from multibox_tpu.models import InceptionV3

    bb = InceptionV3(compute_dtype=jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    eps = bb.apply(v, jnp.zeros((1, 75, 75, 3)))
    sizes = [eps[n].shape[1] for n in cfg.ssd_endpoints]
    priors = generate_priors_multiscale(
        sizes, aspect_ratios=(1.0, 2.0, 0.5), add_interp_scale=True
    )
    assert priors.shape[1] == 4
    cfg.num_priors = priors.shape[0]
    model = build_model(cfg, priors.shape[0])
    return cfg, model, jnp.asarray(priors), sizes


def test_priors_align_with_head(ssd_setup):
    cfg, model, priors, sizes = ssd_setup
    want = sum(f * f * cfg.ssd_priors_per_cell for f in sizes)
    assert priors.shape[0] == want
    x = jnp.zeros((1, 75, 75, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(variables, x)
    assert loc.shape == (1, want, 4)
    assert conf.shape == (1, want)


def test_ssd_train_step_decreases_loss(ssd_setup):
    cfg, model, priors, _ = ssd_setup
    from multibox_tpu.train import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), priors.shape[0])
    step = jax.jit(make_train_step(cfg, model, priors))
    batch = {
        "images": jnp.asarray(rng.normal(0, 0.5, (2, 75, 75, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.stack([random_boxes(rng, 3, min_size=0.2),
                                       random_boxes(rng, 3, min_size=0.2)])),
        "num_boxes": jnp.asarray([2, 1], np.int32),
    }
    state, m0 = step(state, batch)
    first = float(m0["loss"])
    for _ in range(25):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first, (first, float(metrics["loss"]))


def test_ssd_detect_pipeline(ssd_setup):
    cfg, model, priors, _ = ssd_setup
    from multibox_tpu.inference import make_detect_fn

    x = jnp.zeros((2, 75, 75, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    detect = make_detect_fn(cfg, priors, use_ema=False)
    out = detect(dict(variables), x)
    assert out["boxes"].shape == (2, cfg.max_detections, 4)
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_multiclass_detect(rng):
    """num_classes > 1: per-class scores and class-aware NMS."""
    cfg = Config(
        input_size=75, num_priors=8, num_classes=5, compute_dtype="float32",
        max_detections=6, detect_score_threshold=0.0,
    )
    from multibox_tpu.inference import build_model, make_detect_fn

    priors = jnp.asarray(
        np.sort(rng.uniform(0.1, 0.9, (8, 2, 2)).astype(np.float32), axis=1
                ).reshape(8, 4))
    model = build_model(cfg, 8)
    x = jnp.zeros((1, 75, 75, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(variables, x)
    assert conf.shape == (1, 8, 5)
    detect = make_detect_fn(cfg, priors, use_ema=False)
    out = detect(dict(variables), x)
    classes = np.asarray(out["classes"][0])
    n = int(out["num"][0])
    assert ((classes[:n] >= 0) & (classes[:n] < 5)).all()
