"""import_slim_checkpoint end-to-end: build a real TF checkpoint with slim
variable names (incl. the Mixed_5c quirk and EMA shadows), import, verify."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def slim_ckpt(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")
    from multibox_tpu.models import tf_import

    root = tmp_path_factory.mktemp("slim")
    rng = np.random.default_rng(0)

    # Shapes from our own (already keras-parity-verified) backbone init.
    from multibox_tpu.models import InceptionV3

    model = InceptionV3(compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))

    import flax

    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"])

    tf1 = tf.compat.v1
    graph = tf.Graph()
    expected = {}
    with graph.as_default():
        for unit in tf_import.conv_unit_order():
            slim = f"InceptionV3/{tf_import._slim_name(unit)}"
            path = tf_import._unit_path((), unit)
            kshape = params[path + ("Conv", "kernel")].shape
            cshape = params[path + ("BatchNorm", "bias")].shape
            for name, shape in [
                (f"{slim}/weights", kshape),
                (f"{slim}/BatchNorm/beta", cshape),
                (f"{slim}/BatchNorm/moving_mean", cshape),
                (f"{slim}/BatchNorm/moving_variance", cshape),
            ]:
                value = rng.normal(0, 0.05, shape).astype(np.float32)
                expected[name] = value
                tf1.get_variable(name, initializer=value)
            # EMA shadow for the kernel (inference restore path).
            ema = rng.normal(0, 0.05, kshape).astype(np.float32)
            expected[f"{slim}/weights/ExponentialMovingAverage"] = ema
            tf1.get_variable(
                f"{slim}/weights/ExponentialMovingAverage", initializer=ema
            )
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt = saver.save(sess, str(root / "inception_v3.ckpt"))
    return ckpt, variables, expected


def test_slim_name_quirks_pinned():
    """Pin the slim naming quirks as LITERALS (the checkpoint fixture uses
    _slim_name itself, so these must be asserted independently)."""
    from multibox_tpu.models.tf_import import _slim_name

    assert _slim_name("Mixed_5c/Branch_1/Conv2d_0a_1x1") == \
        "Mixed_5c/Branch_1/Conv2d_0b_1x1"
    assert _slim_name("Mixed_5c/Branch_1/Conv2d_0b_5x5") == \
        "Mixed_5c/Branch_1/Conv_1_0c_5x5"
    # Mixed_7c renames only the second 3x1 conv of Branch_1 (7b keeps 0b).
    assert _slim_name("Mixed_7c/Branch_1/Conv2d_0b_3x1") == \
        "Mixed_7c/Branch_1/Conv2d_0c_3x1"
    assert _slim_name("Mixed_7b/Branch_1/Conv2d_0b_3x1") == \
        "Mixed_7b/Branch_1/Conv2d_0b_3x1"
    assert _slim_name("Conv2d_1a_3x3") == "Conv2d_1a_3x3"


def test_slim_import_raw(slim_ckpt):
    from multibox_tpu.models import tf_import
    import flax

    ckpt, variables, expected = slim_ckpt
    out = tf_import.import_slim_checkpoint(ckpt, variables)
    params = flax.traverse_util.flatten_dict(out["params"])
    stats = flax.traverse_util.flatten_dict(out["batch_stats"])

    # Spot-check stem, the Mixed_5c quirk unit, and a deep unit.
    checks = [
        ("Conv2d_1a_3x3", "InceptionV3/Conv2d_1a_3x3"),
        ("Mixed_5c/Branch_1/Conv2d_0b_5x5",
         "InceptionV3/Mixed_5c/Branch_1/Conv_1_0c_5x5"),
        ("Mixed_7c/Branch_2/Conv2d_0d_3x1",
         "InceptionV3/Mixed_7c/Branch_2/Conv2d_0d_3x1"),
    ]
    from multibox_tpu.models.tf_import import _unit_path

    for unit, slim in checks:
        path = _unit_path((), unit)
        np.testing.assert_array_equal(
            np.asarray(params[path + ("Conv", "kernel")]),
            expected[f"{slim}/weights"],
        )
        np.testing.assert_array_equal(
            np.asarray(params[path + ("BatchNorm", "bias")]),
            expected[f"{slim}/BatchNorm/beta"],
        )
        np.testing.assert_array_equal(
            np.asarray(stats[path + ("BatchNorm", "mean")]),
            expected[f"{slim}/BatchNorm/moving_mean"],
        )


def test_slim_import_ema(slim_ckpt):
    from multibox_tpu.models import tf_import
    from multibox_tpu.models.tf_import import _unit_path
    import flax

    ckpt, variables, expected = slim_ckpt
    out = tf_import.import_slim_checkpoint(ckpt, variables, use_ema=True)
    params = flax.traverse_util.flatten_dict(out["params"])
    # Kernels must come from the EMA shadows; betas (no shadow saved) from raw.
    path = _unit_path((), "Conv2d_1a_3x3")
    np.testing.assert_array_equal(
        np.asarray(params[path + ("Conv", "kernel")]),
        expected["InceptionV3/Conv2d_1a_3x3/weights/ExponentialMovingAverage"],
    )
    np.testing.assert_array_equal(
        np.asarray(params[path + ("BatchNorm", "bias")]),
        expected["InceptionV3/Conv2d_1a_3x3/BatchNorm/beta"],
    )


def test_slim_import_missing_var_raises(slim_ckpt, tmp_path):
    tf = pytest.importorskip("tensorflow")
    from multibox_tpu.models import tf_import

    _, variables, _ = slim_ckpt
    tf1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        tf1.get_variable("InceptionV3/Conv2d_1a_3x3/weights",
                         initializer=np.zeros((3, 3, 3, 32), np.float32))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "partial.ckpt"))
    with pytest.raises(KeyError):
        tf_import.import_slim_checkpoint(ckpt, variables)
