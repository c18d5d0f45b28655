"""Golden regression test: fixed-seed end-to-end detect → frozen outputs
(SURVEY.md §4 "fixed-seed end-to-end detect on a tiny fixture → frozen
expected boxes"). Catches any unintended numerical change in the
model/decode/NMS pipeline. Golden values regenerate by deleting the file.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.inference import build_model, make_detect_fn

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "detect_v1.npz")


def test_detect_golden():
    cfg = Config(
        input_size=75, num_priors=16, compute_dtype="float32",
        max_detections=8, detect_score_threshold=0.0, nms_iou_threshold=0.5,
    )
    rng = np.random.default_rng(42)
    priors = np.sort(
        rng.uniform(0.05, 0.95, (16, 2, 2)).astype(np.float32), axis=1
    ).reshape(16, 4)

    model = build_model(cfg, 16)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 75, 75, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    detect = make_detect_fn(cfg, jnp.asarray(priors), use_ema=False)
    out = detect(dict(variables), x)
    got = {
        "boxes": np.asarray(out["boxes"]),
        "scores": np.asarray(out["scores"]),
        "num": np.asarray(out["num"]),
    }

    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
        raise AssertionError(
            "golden file created on first run — rerun to validate against it"
        )

    want = np.load(GOLDEN)
    np.testing.assert_array_equal(got["num"], want["num"])
    np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)
