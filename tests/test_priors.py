"""Prior generation: determinism, clustering quality, multiscale layout."""

import numpy as np
import pytest

from multibox_tpu import priors as priors_mod
from tests.conftest import random_boxes

# Fast tier: no 8-device e2e state, runs in the `-m smoke` subset.
pytestmark = pytest.mark.smoke


def test_kmeans_deterministic(rng):
    boxes = random_boxes(rng, 500)
    p1 = priors_mod.generate_priors_kmeans(boxes, 16, seed=3)
    p2 = priors_mod.generate_priors_kmeans(boxes, 16, seed=3)
    np.testing.assert_array_equal(p1, p2)


def test_kmeans_covers_modes(rng):
    # Two tight clusters of boxes: priors should land near both.
    a = np.tile([[0.1, 0.1, 0.3, 0.3]], (100, 1)) + rng.normal(0, 0.005, (100, 4))
    b = np.tile([[0.6, 0.6, 0.9, 0.9]], (100, 1)) + rng.normal(0, 0.005, (100, 4))
    boxes = np.concatenate([a, b]).astype(np.float32)
    priors = priors_mod.generate_priors_kmeans(boxes, 2, seed=0)
    d_a = np.linalg.norm(priors - [0.1, 0.1, 0.3, 0.3], axis=1).min()
    d_b = np.linalg.norm(priors - [0.6, 0.6, 0.9, 0.9], axis=1).min()
    assert d_a < 0.05 and d_b < 0.05


def test_kmeans_shape_and_validity(rng):
    boxes = random_boxes(rng, 300)
    priors = priors_mod.generate_priors_kmeans(boxes, 32, seed=1)
    assert priors.shape == (32, 4)
    assert (priors[:, 2] >= priors[:, 0]).all()
    assert (priors[:, 3] >= priors[:, 1]).all()


def test_multiscale_count_and_range():
    sizes = [8, 4, 2, 1]
    ars = (1.0, 2.0, 0.5)
    priors = priors_mod.generate_priors_multiscale(sizes, aspect_ratios=ars)
    per_cell = len(ars) + 1  # + interpolated-scale square
    want = sum(f * f * per_cell for f in sizes)
    assert priors.shape == (want, 4)
    assert priors.min() >= 0.0 and priors.max() <= 1.0


def test_save_load_roundtrip(tmp_path, rng):
    boxes = random_boxes(rng, 100)
    priors = priors_mod.generate_priors_kmeans(boxes, 8)
    path = str(tmp_path / "priors.pkl")
    priors_mod.save_priors(priors, path)
    loaded = priors_mod.load_priors(path)
    np.testing.assert_array_equal(priors, loaded)


def test_load_rejects_bad_shape(tmp_path):
    import pickle

    path = str(tmp_path / "bad.pkl")
    with open(path, "wb") as f:
        pickle.dump(np.zeros((3, 5)), f)
    with pytest.raises(ValueError):
        priors_mod.load_priors(path)
