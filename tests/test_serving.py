"""Serving loader: export dir → callable detector, batch splitting/padding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    """Build a tiny detector and export it via the export CLI machinery."""
    root = tmp_path_factory.mktemp("serve")
    from multibox_tpu.config import Config
    from multibox_tpu.inference import build_model
    from multibox_tpu.priors import save_priors
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.checkpoint import CheckpointManager

    rng = np.random.default_rng(0)
    priors = np.sort(
        rng.uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32), axis=1
    ).reshape(8, 4)
    cfg = Config(input_size=75, num_priors=8, compute_dtype="float32",
                 max_detections=5, detect_score_threshold=0.0)
    model = build_model(cfg, 8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 8)
    ckpt_dir = str(root / "ckpt")
    mgr = CheckpointManager(ckpt_dir, save_every=1)
    mgr.save(1, state, force=True)
    mgr.wait()
    mgr.close()
    priors_path = str(root / "priors.pkl")
    save_priors(priors, priors_path)
    import yaml

    cfg_path = str(root / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"INPUT_SIZE": 75, "NUM_PRIORS": 8,
                        "compute_dtype": "float32", "max_detections": 5,
                        "detect_score_threshold": 0.0}, f)

    from multibox_tpu.cli.export import main

    out_dir = str(root / "export")
    assert main([
        "--checkpoint_path", ckpt_dir, "--priors", priors_path,
        "--output_dir", out_dir, "--config", cfg_path, "--batch_size", "2",
    ]) == 0
    return out_dir


def test_load_and_run(export_dir):
    from multibox_tpu.serving import load_exported

    det = load_exported(export_dir)
    assert det.batch_size == 2
    assert det.input_size == 75
    out = det(np.zeros((2, 75, 75, 3), np.float32))
    assert out["boxes"].shape == (2, 5, 4)
    assert np.isfinite(out["scores"]).all()


def test_batch_split_and_pad(export_dir):
    from multibox_tpu.serving import load_exported

    det = load_exported(export_dir)
    # 5 images through a batch-2 export: 2+2+1(padded)
    out = det(np.zeros((5, 75, 75, 3), np.float32))
    assert out["boxes"].shape == (5, 5, 4)
    assert out["num"].shape == (5,)


def test_exported_matches_live_model(export_dir):
    """The exported artifact must reproduce the live pipeline bit-for-bit."""
    from multibox_tpu.serving import load_exported

    det = load_exported(export_dir)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 75, 75, 3)).astype(np.float32)
    out = det(x)
    # Live path: restore the same checkpoint and run make_detect_fn.
    import os

    from multibox_tpu.inference import build_model, make_detect_fn
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.checkpoint import CheckpointManager

    cfg = det.config
    model = build_model(cfg, 8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 8)
    ckpt_dir = os.path.join(os.path.dirname(export_dir), "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    mgr.close()
    live = make_detect_fn(cfg, jnp.asarray(det.priors))
    want = live(state.detect_variables(), jnp.asarray(x))
    np.testing.assert_allclose(out["boxes"], np.asarray(want["boxes"]), atol=1e-6)
    np.testing.assert_allclose(out["scores"], np.asarray(want["scores"]), atol=1e-6)


def test_saved_model_export(export_dir, tmp_path):
    """--saved_model writes a TF SavedModel via jax2tf that runs and matches."""
    tf = pytest.importorskip("tensorflow")
    import os

    from multibox_tpu.cli.export import main

    root = os.path.dirname(export_dir)
    out_dir = str(tmp_path / "export_tf")
    assert main([
        "--checkpoint_path", os.path.join(root, "ckpt"),
        "--priors", os.path.join(root, "priors.pkl"),
        "--output_dir", out_dir,
        "--config", os.path.join(root, "cfg.yaml"),
        "--batch_size", "2", "--saved_model",
    ]) == 0
    sm_dir = os.path.join(out_dir, "saved_model")
    assert os.path.isdir(sm_dir)
    module = tf.saved_model.load(sm_dir)
    x = np.zeros((2, 75, 75, 3), np.float32)
    tf_out = module.detect(tf.constant(x))
    # Compare against the StableHLO artifact from the same weights.
    from multibox_tpu.serving import load_exported

    det = load_exported(export_dir)
    want = det(x)
    got_boxes = None
    for t in (tf_out.values() if isinstance(tf_out, dict) else tf_out):
        arr = np.asarray(t)
        if arr.shape == want["boxes"].shape:
            got_boxes = arr
    assert got_boxes is not None
    np.testing.assert_allclose(got_boxes, want["boxes"], atol=1e-5)


def test_multi_batch_size_export_dispatch(export_dir, tmp_path):
    """--batch_sizes exports one program per size; serving dispatches each
    request to the best fit (largest <= remainder, smallest padded for
    the tail) and matches the single-size export's outputs."""
    from multibox_tpu.cli.export import main
    from multibox_tpu.serving import load_exported
    import os

    # Re-export the same checkpoint with sizes {1, 4}.
    src = os.path.dirname(export_dir)
    out_dir = str(tmp_path / "export_multi")
    assert main([
        "--checkpoint_path", os.path.join(src, "ckpt"),
        "--priors", os.path.join(src, "priors.pkl"),
        "--output_dir", out_dir, "--config", os.path.join(src, "cfg.yaml"),
        "--batch_sizes", "1", "4",
    ]) == 0
    assert os.path.exists(os.path.join(out_dir, "detect.stablehlo.bin"))
    assert os.path.exists(os.path.join(out_dir, "detect_b4.stablehlo.bin"))

    multi = load_exported(out_dir)
    single = load_exported(export_dir)
    assert sorted(multi.calls) == [1, 4]
    assert multi.batch_size == 4

    rng = np.random.default_rng(7)
    imgs = rng.uniform(-1, 1, (6, 75, 75, 3)).astype(np.float32)
    got = multi(imgs)          # dispatches 4 + 1 + 1: zero padding rows
    want = single(imgs)        # 2+2+2 through the batch-2 export
    assert got["boxes"].shape == (6, 5, 4)
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)
    np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
    # empty batch still served from shape inference only
    empty = multi(np.zeros((0, 75, 75, 3), np.float32))
    assert empty["boxes"].shape == (0, 5, 4)


def test_reexport_removes_stale_batch_siblings(export_dir, tmp_path):
    """A second export into the same directory must not leave an older
    checkpoint's detect_b* sibling behind (the loader would silently
    serve stale weights for that batch size)."""
    from multibox_tpu.cli.export import main
    from multibox_tpu.serving import load_exported
    import os

    src = os.path.dirname(export_dir)
    out_dir = str(tmp_path / "re_export")
    args = ["--checkpoint_path", os.path.join(src, "ckpt"),
            "--priors", os.path.join(src, "priors.pkl"),
            "--output_dir", out_dir, "--config", os.path.join(src, "cfg.yaml")]
    assert main(args + ["--batch_sizes", "1", "4"]) == 0
    assert os.path.exists(os.path.join(out_dir, "detect_b4.stablehlo.bin"))
    assert main(args + ["--batch_sizes", "2"]) == 0
    # b4 sibling gone; only the fresh single-size export remains.
    assert not os.path.exists(os.path.join(out_dir, "detect_b4.stablehlo.bin"))
    det = load_exported(out_dir)
    assert sorted(det.calls) == [2]


def test_warmup_materializes_every_output_leaf():
    """warmup() must force a HOST materialization of each program's outputs.

    jax.block_until_ready does not sync through this container's device
    relay (CLAUDE.md): round 5 measured the daemon's ready event firing
    while the first execution was still in flight, so the first request
    group ate the compile stall as a 503 cascade. The guarantee that holds
    on every link is an explicit D2H per output leaf (np.asarray); this
    pins that warmup performs it — a lazy leaf records whether anything
    ever asked for its host value."""
    from multibox_tpu.serving import ExportedDetector

    class _LazyLeaf:
        def __init__(self):
            self.materialized = False

        def __array__(self, dtype=None, copy=None):
            self.materialized = True
            return np.zeros((1,), np.float32)

    leaves = {}

    def make_call(size):
        def call(x):
            assert x.shape[0] == size
            leaves[size] = [_LazyLeaf(), _LazyLeaf()]
            return {"boxes": leaves[size][0], "scores": leaves[size][1]}

        return call

    det = ExportedDetector(
        detect=lambda x: None, config=None,
        priors=np.zeros((4, 4), np.float32), batch_size=8, input_size=16,
        calls={8: make_call(8), 2: make_call(2)},
    )
    det.warmup()
    assert sorted(leaves) == [2, 8]  # every exported program executed
    for size, pair in leaves.items():
        for leaf in pair:
            assert leaf.materialized, (
                f"warmup returned without host-materializing an output "
                f"leaf of the batch-{size} program"
            )
