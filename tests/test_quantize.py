"""Int8 PTQ path: weight quantization bounds, calibration semantics, and
f32-vs-int8 detect agreement (models/quant.py, quantize.py).

No reference analogue (the TF-1.x reference had no int8 path; SURVEY.md
§2.2 covers the conv substrate this extends) — the contract pinned here is
the framework's own: prepared int8 variables must run the same detect
program shape-for-shape and agree closely with the folded f32 model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multibox_tpu.config import Config
from multibox_tpu.data.augment import preprocess_eval
from multibox_tpu.inference import build_model, make_detect_body
from multibox_tpu.models.quant import quantize_conv_params, quantize_variables
from multibox_tpu.quantize import (
    calib_batches_from_dataset,
    prepare_quantized_variables,
)


def _cfg(**kw):
    base = dict(
        num_priors=16,
        input_size=75,
        compute_dtype="float32",
        max_detections=10,
        batch_size=2,
    )
    base.update(kw)
    return Config(**base)


def test_quantize_conv_params_roundtrip(rng):
    w = rng.normal(0, 0.3, (3, 3, 8, 16)).astype(np.float32)
    w[..., 3] *= 10.0  # one hot channel must not wreck the others' scale
    kq, ws = quantize_conv_params(w)
    assert kq.dtype == np.int8 and ws.shape == (16,)
    err = np.abs(w - kq.astype(np.float32) * ws)
    # symmetric rounding error bound: half a quantization step per channel
    assert np.all(err <= ws[None, None, None, :] * 0.5 + 1e-7)
    # per-channel scales: the hot channel's scale is ~10x the others'
    assert ws[3] > 5 * np.median(ws)


@pytest.fixture(scope="module")
def quant_setup():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    priors = np.sort(
        rng.uniform(0, 1, (16, 2, 2)).astype(np.float32), axis=1
    ).reshape(16, 4)
    model = build_model(cfg, 16)
    images = jnp.zeros((2, 75, 75, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), images))
    calib = [
        rng.integers(0, 255, (2, 75, 75, 3)).astype(np.uint8)
        for _ in range(2)
    ]
    return cfg, priors, variables, calib


def test_prepare_and_detect_agree_with_f32(quant_setup):
    cfg, priors, variables, calib = quant_setup
    vq = prepare_quantized_variables(
        _cfg(quantize="int8"), variables, calib
    )
    # every one of the 94 conv units calibrated a positive scale
    import flax

    scales = flax.traverse_util.flatten_dict(vq["quant"])
    assert len(scales) == 94
    assert all(float(v) > 0 for v in scales.values())

    body_q = make_detect_body(_cfg(quantize="int8"), jnp.asarray(priors))
    body_f = make_detect_body(cfg, jnp.asarray(priors), use_ema=False)
    imgs = preprocess_eval(jnp.asarray(calib[0]), 75)
    det_q = jax.jit(body_q)(vq, imgs)
    det_f = jax.jit(body_f)(variables, imgs)
    # same static output contract
    assert {k: v.shape for k, v in det_q.items()} == {
        k: v.shape for k, v in det_f.items()
    }
    # int8 tracks f32 on the sorted score lists (with a random-init model
    # the scores are near-tied, so NMS may pick different-but-equivalent
    # boxes — raw loc/conf agreement is asserted below instead).
    np.testing.assert_allclose(
        np.asarray(det_q["scores"]), np.asarray(det_f["scores"]), atol=2e-3
    )

    # raw model outputs: quantized backbone tracks the folded f32 one
    model_q = build_model(_cfg(), 16, folded=True, quantize="int8")
    model_f = build_model(cfg, 16)
    loc_q, conf_q = model_q.apply(
        {"params": vq["params"], "quant": vq["quant"]}, imgs, train=False
    )
    loc_f, conf_f = model_f.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        imgs,
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(loc_q), np.asarray(loc_f), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(conf_q), np.asarray(conf_f), atol=5e-2
    )


def test_calibration_is_running_max(quant_setup):
    cfg, priors, variables, calib = quant_setup
    import flax

    qcfg = _cfg(quantize="int8")
    v1 = prepare_quantized_variables(qcfg, variables, calib)
    v2 = prepare_quantized_variables(qcfg, variables, calib + calib)
    s1 = flax.traverse_util.flatten_dict(v1["quant"])
    s2 = flax.traverse_util.flatten_dict(v2["quant"])
    # same data twice -> identical running-max scales (order-invariant)
    for k in s1:
        assert float(s1[k]) == float(s2[k])


def test_quantize_validation(quant_setup):
    cfg, priors, variables, calib = quant_setup
    with pytest.raises(ValueError, match="quantize"):
        make_detect_body(_cfg(quantize="int4"), jnp.asarray(priors))
    with pytest.raises(ValueError, match="folded"):
        # Round 4 lifted the inception-only guard (mobilenet int8 is
        # supported); quantize still requires the BN-FOLDED variant on
        # every backbone (scales are calibrated on folded weights).
        m = build_model(
            _cfg(backbone="mobilenet_v2"), 16, folded=False, quantize="int8"
        )
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    with pytest.raises(ValueError, match="calib"):
        prepare_quantized_variables(_cfg(quantize="int8"), variables, [])
    with pytest.raises(ValueError, match="folded"):
        m = build_model(_cfg(), 16, folded=False, quantize="int8")
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))


def test_calib_batches_from_dataset():
    ds = [{"images": np.full((2, 4, 4, 3), i, np.uint8)} for i in range(5)]
    out = calib_batches_from_dataset(ds, 3)
    assert len(out) == 3 and out[1][0, 0, 0, 0] == 1


def test_quantized_ssd_head(rng):
    """quantize=int8 under the SSD multi-scale head (the pinned multi-class
    eval config): heads read three endpoints of the quantized backbone."""
    cfg = _cfg(
        head_type="ssd",
        box_encoding="ssd",
        num_classes=3,
        ssd_endpoints=("Mixed_5d", "Mixed_6e", "Mixed_7c"),
        ssd_priors_per_cell=3,
        quantize="int8",
    )
    from multibox_tpu.priors import generate_priors_multiscale

    # endpoint grids at 75px input: Mixed_5d 7x7, Mixed_6e 3x3, Mixed_7c 1x1
    priors = np.asarray(
        generate_priors_multiscale(
            feature_map_sizes=[7, 3, 1], aspect_ratios=[1.0, 2.0]
        )
    )
    cfg.num_priors = priors.shape[0]
    fcfg = _cfg(
        head_type="ssd",
        box_encoding="ssd",
        num_classes=3,
        ssd_endpoints=("Mixed_5d", "Mixed_6e", "Mixed_7c"),
        ssd_priors_per_cell=3,
    )
    model = build_model(fcfg, priors.shape[0])
    imgs0 = jnp.zeros((2, 75, 75, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), imgs0))
    calib = [np.random.default_rng(0).integers(0, 255, (2, 75, 75, 3))
             .astype(np.uint8)]
    vq = prepare_quantized_variables(cfg, variables, calib)
    body = make_detect_body(cfg, jnp.asarray(priors))
    det = jax.jit(body)(vq, preprocess_eval(jnp.asarray(calib[0]), 75))
    assert det["boxes"].shape == (2, 10, 4)
    assert np.all(np.isfinite(np.asarray(det["scores"])))


def test_export_quantized(quant_setup, tmp_path):
    """multibox-export --quantize int8: the exported StableHLO program
    carries the calibrated int8 pipeline and runs via the serving loader."""
    import yaml

    from multibox_tpu.data.example_proto import build_detection_example
    from multibox_tpu.data.jpeg import encode_jpeg
    from multibox_tpu.data.tfrecord import TFRecordWriter
    from multibox_tpu.priors import save_priors
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.checkpoint import CheckpointManager

    cfg, priors, variables, calib = quant_setup
    rng = np.random.default_rng(1)
    tf_path = str(tmp_path / "calib.tfrecord")
    with TFRecordWriter(tf_path) as w:
        for i in range(4):
            img = rng.integers(0, 255, (75, 75, 3)).astype(np.uint8)
            w.write(
                build_detection_example(
                    encode_jpeg(img), f"img-{i}",
                    np.array([[0.1, 0.1, 0.5, 0.5]]), labels=[1],
                )
            )
    model = build_model(cfg, 16)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 16)
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir, save_every=1)
    mgr.save(1, state, force=True)
    mgr.wait()
    mgr.close()
    priors_path = str(tmp_path / "priors.pkl")
    save_priors(priors, priors_path)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"INPUT_SIZE": 75, "BATCH_SIZE": 2,
                        "compute_dtype": "float32", "max_detections": 10,
                        "quant_calib_batches": 2,
                        "detect_score_threshold": 0.0}, f)

    from multibox_tpu.cli.export import main

    out_dir = str(tmp_path / "export")
    # calibration data is mandatory
    with pytest.raises(SystemExit, match="calib"):
        main(["--checkpoint_path", ckpt_dir, "--priors", priors_path,
              "--output_dir", out_dir, "--config", cfg_path,
              "--quantize", "int8"])
    assert main([
        "--checkpoint_path", ckpt_dir, "--priors", priors_path,
        "--output_dir", out_dir, "--config", cfg_path,
        "--quantize", "int8", "--calib_tfrecords", tf_path,
        "--batch_size", "2",
    ]) == 0

    from multibox_tpu.serving import load_exported

    det = load_exported(out_dir)
    imgs = (
        rng.uniform(0, 255, (2, 75, 75, 3)).astype(np.float32) / 255.0 - 0.5
    ) * 2.0
    out = det(imgs)
    assert out["boxes"].shape == (2, 10, 4)
    assert np.all(np.isfinite(out["scores"]))
    # int8 weights made it into the frozen params
    saved = np.load(str(tmp_path / "export" / "params.npz"))
    kq = [k for k in saved.files if k.endswith("kernel_q")]
    assert len(kq) == 94 and saved[kq[0]].dtype == np.int8


def test_quantize_variables_passthrough(quant_setup):
    """Head params and conv biases survive the transform untouched."""
    cfg, priors, variables, calib = quant_setup
    import flax

    from multibox_tpu.models.inception_v3 import fold_batch_norms

    folded = fold_batch_norms(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }
    )
    vq = quantize_variables(folded)
    flat_in = flax.traverse_util.flatten_dict(folded["params"])
    flat_out = flax.traverse_util.flatten_dict(vq["params"])
    for key, val in flat_in.items():
        if key[0] != "InceptionV3":
            assert key in flat_out and flat_out[key] is val
        elif key[-1] == "bias":
            assert key in flat_out and flat_out[key] is val
        else:
            assert key[-1] == "kernel"
            assert key[:-1] + ("kernel_q",) in flat_out
            assert key[:-1] + ("w_scale",) in flat_out


@pytest.fixture(scope="module")
def mobilenet_setup():
    """MobileNetV2 detector variables with NON-TRIVIAL BN stats/γ: the
    default init (mean=0, var=1, γ=1) would make the scale-ful fold
    untestable (γ·s ≡ 1)."""
    import flax

    cfg = _cfg(backbone="mobilenet_v2", mobilenet_width=0.5, input_size=64)
    rng = np.random.default_rng(1)
    priors = np.sort(
        rng.uniform(0, 1, (16, 2, 2)).astype(np.float32), axis=1
    ).reshape(16, 4)
    model = build_model(cfg, 16)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), images))

    def perturb(tree, fn):
        flat = flax.traverse_util.flatten_dict(tree)
        out = {}
        for k, v in flat.items():
            out[k] = fn(k, np.asarray(v))
        return flax.traverse_util.unflatten_dict(out)

    r = np.random.default_rng(2)
    variables["batch_stats"] = perturb(
        variables["batch_stats"],
        lambda k, v: (
            r.uniform(0.5, 2.0, v.shape).astype(v.dtype)
            if k[-1] == "var" else r.normal(0, 0.2, v.shape).astype(v.dtype)
        ),
    )
    variables["params"] = perturb(
        variables["params"],
        lambda k, v: (
            r.uniform(0.7, 1.4, v.shape).astype(v.dtype)
            if k[-2:] == ("BatchNorm", "scale") else v
        ),
    )
    calib = [
        rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        for _ in range(2)
    ]
    return cfg, priors, variables, calib


def test_mobilenet_fold_parity(mobilenet_setup):
    """Folded mobilenet (scale-ful BN baked into conv weight+bias) must
    reproduce the live eval-mode model (VERDICT round-3 item #3)."""
    from multibox_tpu.models.inception_v3 import fold_batch_norms

    cfg, priors, variables, calib = mobilenet_setup
    imgs = preprocess_eval(jnp.asarray(calib[0]), cfg.input_size)
    live = build_model(cfg, 16)
    loc_l, conf_l = live.apply(variables, imgs, train=False)

    folded_vars = fold_batch_norms(variables)
    # γ must be consumed: no BatchNorm params survive the fold
    import flax

    flat = flax.traverse_util.flatten_dict(folded_vars["params"])
    assert not any("BatchNorm" in k for k in flat), [
        k for k in flat if "BatchNorm" in k
    ][:3]
    folded = build_model(cfg, 16, folded=True)
    loc_f, conf_f = folded.apply(folded_vars, imgs, train=False)
    np.testing.assert_allclose(
        np.asarray(loc_f), np.asarray(loc_l), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(conf_f), np.asarray(conf_l), atol=2e-3
    )


def test_mobilenet_int8_detect_tracks_f32(mobilenet_setup):
    """Int8 PTQ on the mobilenet backbone (grouped/depthwise QuantConv):
    full detect program agrees with the f32 path (VERDICT round-3 #3)."""
    import flax

    cfg, priors, variables, calib = mobilenet_setup
    qcfg = _cfg(
        backbone="mobilenet_v2", mobilenet_width=0.5, input_size=64,
        quantize="int8",
    )
    vq = prepare_quantized_variables(qcfg, variables, calib)
    scales = flax.traverse_util.flatten_dict(vq["quant"])
    kernels = [
        k for k in flax.traverse_util.flatten_dict(vq["params"])
        if k[-1] == "kernel_q"
    ]
    assert len(scales) == len(kernels) > 0
    assert all(float(v) > 0 for v in scales.values())
    assert all(k[0] == "MobileNetV2" for k in kernels)

    body_q = make_detect_body(qcfg, jnp.asarray(priors))
    body_f = make_detect_body(cfg, jnp.asarray(priors), use_ema=False)
    imgs = preprocess_eval(jnp.asarray(calib[0]), cfg.input_size)
    det_q = jax.jit(body_q)(vq, imgs)
    det_f = jax.jit(body_f)(variables, imgs)
    assert {k: v.shape for k, v in det_q.items()} == {
        k: v.shape for k, v in det_f.items()
    }
    np.testing.assert_allclose(
        np.asarray(det_q["scores"]), np.asarray(det_f["scores"]), atol=3e-3
    )
