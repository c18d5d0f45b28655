"""Horizontal-flip test-time augmentation (cfg.flip_tta).

The TTA detect program runs the model on the image and its mirror in one
doubled batch, mirrors the flipped pass's decoded boxes back, and NMS-es
the union of candidates. Pinned properties: output contract is unchanged,
and the program is mirror-invariant — detecting on mirror(I) with TTA
gives exactly the mirrored detections of I (the candidate set is symmetric
by construction).
"""

import numpy as np

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.inference import build_model, make_detect_fn
from multibox_tpu.ops.boxes import flip_boxes_horizontal


def _tiny_setup(rng, num_classes=1, flip_tta=True):
    cfg = Config(
        input_size=96, backbone="mobilenet_v2", num_priors=16,
        compute_dtype="float32", max_detections=5,
        detect_score_threshold=0.0, num_classes=num_classes,
        flip_tta=flip_tta,
    )
    priors = jnp.asarray(np.sort(
        rng.uniform(0.05, 0.95, (16, 2, 2)).astype(np.float32), axis=1
    ).reshape(16, 4))
    model = build_model(cfg, 16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    images = jnp.asarray(
        rng.normal(0, 0.5, (2, 96, 96, 3)).astype(np.float32)
    )
    return cfg, priors, dict(variables), images


def test_flip_tta_output_contract(rng):
    """TTA keeps the exact output shapes/dtypes of the plain program."""
    cfg, priors, variables, images = _tiny_setup(rng)
    out = make_detect_fn(cfg, priors, use_ema=False)(variables, images)
    plain_cfg = Config(**{**cfg.__dict__, "flip_tta": False})
    ref = make_detect_fn(plain_cfg, priors, use_ema=False)(variables, images)
    for k in ("boxes", "scores", "classes", "num"):
        assert out[k].shape == ref[k].shape, k
        assert out[k].dtype == ref[k].dtype, k
    assert np.all(np.asarray(out["num"]) <= cfg.max_detections)


def _sorted_dets(out, i):
    n = int(out["num"][i])
    order = np.argsort(-np.asarray(out["scores"][i, :n]), kind="stable")
    return (
        np.asarray(out["boxes"][i, :n])[order],
        np.asarray(out["scores"][i, :n])[order],
        np.asarray(out["classes"][i, :n])[order],
    )


def _assert_mirror_invariant(cfg, priors, variables, images):
    detect = make_detect_fn(cfg, priors, use_ema=False)
    out = detect(variables, images)
    out_m = detect(variables, images[:, :, ::-1, :])
    for i in range(images.shape[0]):
        boxes, scores, classes = _sorted_dets(out, i)
        boxes_m, scores_m, classes_m = _sorted_dets(out_m, i)
        assert boxes.shape == boxes_m.shape
        np.testing.assert_allclose(scores, scores_m, atol=1e-6)
        np.testing.assert_allclose(
            boxes, np.asarray(flip_boxes_horizontal(jnp.asarray(boxes_m))),
            atol=1e-5,
        )
        np.testing.assert_array_equal(classes, classes_m)


def test_flip_tta_mirror_invariance(rng):
    """detect(mirror(I)) == mirror(detect(I)) under TTA — the candidate
    union {f(I), mirror(f(mirror I))} is symmetric by construction."""
    cfg, priors, variables, images = _tiny_setup(rng)
    _assert_mirror_invariant(cfg, priors, variables, images)


def test_flip_tta_mirror_invariance_multiclass(rng):
    """Same property through the per-class sweep path ([B, 2P, C] grid)."""
    cfg, priors, variables, images = _tiny_setup(rng, num_classes=3)
    _assert_mirror_invariant(cfg, priors, variables, images)


def test_flip_tta_dominates_plain_top_score(rng):
    """The TTA candidate union is a superset of the plain candidates, and
    NMS always keeps the global score max first — so the top TTA detection
    scores at least as high as the top plain detection on every image."""
    cfg, priors, variables, images = _tiny_setup(rng)
    out = make_detect_fn(cfg, priors, use_ema=False)(variables, images)
    plain_cfg = Config(**{**cfg.__dict__, "flip_tta": False})
    ref = make_detect_fn(plain_cfg, priors, use_ema=False)(variables, images)
    top_tta = np.asarray(out["scores"])[:, 0]
    top_plain = np.asarray(ref["scores"])[:, 0]
    assert np.all(top_tta >= top_plain - 1e-6)
