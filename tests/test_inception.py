"""Backbone + head tests, incl. golden forward parity vs TF keras
InceptionV3 with imported weights (SURVEY.md §4 "Golden / parity")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.models import InceptionV3, MultiBoxDetector
from multibox_tpu.models import tf_import


@pytest.fixture(scope="module")
def backbone_f32():
    model = InceptionV3(compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    return model, variables


def test_endpoint_shapes(backbone_f32):
    model, variables = backbone_f32
    eps = model.apply(variables, jnp.zeros((2, 299, 299, 3)))
    want = {
        "Conv2d_1a_3x3": (2, 149, 149, 32),
        "MaxPool_3a_3x3": (2, 73, 73, 64),
        "Conv2d_4a_3x3": (2, 71, 71, 192),
        "MaxPool_5a_3x3": (2, 35, 35, 192),
        "Mixed_5b": (2, 35, 35, 256),
        "Mixed_5d": (2, 35, 35, 288),
        "Mixed_6a": (2, 17, 17, 768),
        "Mixed_6e": (2, 17, 17, 768),
        "Mixed_7a": (2, 8, 8, 1280),
        "Mixed_7c": (2, 8, 8, 2048),
    }
    for name, shape in want.items():
        assert eps[name].shape == shape, (name, eps[name].shape)


def test_param_count(backbone_f32):
    _, variables = backbone_f32
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # Inception-v3 feature extractor: ~21.8M params.
    assert 21e6 < n < 23e6, n


def test_detector_output_shapes():
    model = MultiBoxDetector(num_priors=50, compute_dtype=jnp.float32)
    x = jnp.zeros((2, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(variables, x)
    assert loc.shape == (2, 50, 4)
    assert conf.shape == (2, 50)
    assert loc.dtype == jnp.float32


def test_ssd_detector_output_shapes():
    from multibox_tpu.priors import generate_priors_multiscale

    priors = generate_priors_multiscale(
        [35, 17, 8], aspect_ratios=(1.0, 2.0, 0.5), add_interp_scale=True
    )
    P = priors.shape[0]
    model = MultiBoxDetector(
        num_priors=P, head_type="ssd", ssd_priors_per_cell=4,
        compute_dtype=jnp.float32,
    )
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(variables, x)
    assert loc.shape == (1, P, 4)
    assert conf.shape == (1, P)


def test_conv_unit_order_count():
    # Inception-v3 base has 94 conv units.
    assert len(tf_import.conv_unit_order()) == 94


@pytest.mark.slow
def test_forward_parity_vs_keras(backbone_f32):
    """Import keras (random) weights; outputs must agree to float32 noise."""
    tf = pytest.importorskip("tensorflow")

    keras_model = tf.keras.applications.InceptionV3(
        weights=None, include_top=False, input_shape=(299, 299, 3)
    )
    model, variables = backbone_f32
    variables = tf_import.import_keras_inception_v3(keras_model, variables)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 299, 299, 3)).astype(np.float32)

    got = model.apply(variables, jnp.array(x))["Mixed_7c"]
    want = keras_model(x, training=False).numpy()

    assert got.shape == want.shape
    got = np.asarray(got)
    # 94 stacked float32 convs: tiny accumulation noise flips values right
    # at ReLU boundaries, making *relative* error meaningless there — use an
    # absolute tolerance sized to the observed noise, plus near-perfect
    # correlation as the structural check.
    np.testing.assert_allclose(got, want, atol=1e-4)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999999, corr


def test_bn_folding_matches_unfolded(backbone_f32):
    """Folded (Conv+bias, no BN) forward == eval-mode BN forward."""
    from multibox_tpu.models.inception_v3 import fold_batch_norms

    model, variables = backbone_f32
    rng = np.random.default_rng(3)
    # Give the BN stats non-trivial values so folding is actually exercised.
    import flax

    stats = flax.traverse_util.flatten_dict(variables["batch_stats"])
    r2 = np.random.default_rng(5)
    stats = {
        k: jnp.asarray(r2.uniform(0.5, 1.5, v.shape).astype(np.float32))
        if k[-1] == "var"
        else jnp.asarray(r2.normal(0, 0.2, v.shape).astype(np.float32))
        for k, v in stats.items()
    }
    variables = dict(variables)
    variables["batch_stats"] = flax.traverse_util.unflatten_dict(stats)

    x = jnp.asarray(rng.uniform(-1, 1, (1, 75, 75, 3)).astype(np.float32))
    want = model.apply(variables, x)["Mixed_7c"]

    folded_model = InceptionV3(compute_dtype=jnp.float32, folded=True)
    folded_vars = fold_batch_norms(variables)
    got = folded_model.apply(folded_vars, x)["Mixed_7c"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
