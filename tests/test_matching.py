"""Matching vs scipy.optimize.linear_sum_assignment oracle (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from multibox_tpu.ops import matching
from multibox_tpu.ops import boxes as box_ops
from tests.conftest import random_boxes

# Fast tier: no 8-device e2e state, runs in the `-m smoke` subset.
pytestmark = pytest.mark.smoke


def total_benefit(benefit, assignment):
    b = 0.0
    for i, j in enumerate(assignment):
        if j >= 0:
            b += benefit[i, j]
    return b


def scipy_optimal(benefit, num_gt):
    rows, cols = linear_sum_assignment(benefit[:num_gt], maximize=True)
    return float(benefit[rows, cols].sum())


@pytest.mark.parametrize("G,P,num_gt", [(5, 40, 5), (8, 100, 3), (1, 16, 1), (16, 64, 16)])
def test_hungarian_matches_scipy_total(rng, G, P, num_gt):
    benefit = rng.uniform(0, 1, size=(G, P)).astype(np.float32)
    got = np.asarray(matching.hungarian_match(jnp.array(benefit), jnp.int32(num_gt)))
    # Padded rows unassigned; active rows assigned distinct priors.
    assert (got[num_gt:] == -1).all()
    active = got[:num_gt]
    assert (active >= 0).all()
    assert len(set(active.tolist())) == num_gt
    tb = total_benefit(benefit, got)
    opt = scipy_optimal(benefit, num_gt)
    assert tb >= opt - num_gt * 1e-5, (tb, opt)


def test_hungarian_on_iou_benefit(rng):
    gt = random_boxes(rng, 6)
    priors = random_boxes(rng, 80)
    benefit = np.asarray(box_ops.iou_matrix(jnp.array(gt), jnp.array(priors)))
    got = np.asarray(matching.hungarian_match(jnp.array(benefit), jnp.int32(6)))
    tb = total_benefit(benefit, got)
    opt = scipy_optimal(benefit, 6)
    assert tb >= opt - 6 * 1e-5


def test_hungarian_many_random_exact(rng):
    # Fuzz: 20 random instances, exact agreement with scipy's optimum.
    for _ in range(20):
        G = int(rng.integers(1, 12))
        P = int(rng.integers(G, 60))
        benefit = rng.uniform(0, 1, size=(G, P)).astype(np.float32)
        got = np.asarray(matching.hungarian_match(jnp.array(benefit), jnp.int32(G)))
        tb = total_benefit(benefit, got)
        opt = scipy_optimal(benefit, G)
        assert abs(tb - opt) < 1e-4, (G, P, tb, opt)


def test_hungarian_jits_and_vmaps(rng):
    B, G, P = 3, 6, 30
    benefit = rng.uniform(0, 1, size=(B, G, P)).astype(np.float32)
    num_gt = np.array([6, 2, 0], dtype=np.int32)
    fn = jax.jit(jax.vmap(matching.hungarian_match))
    got = np.asarray(fn(jnp.array(benefit), jnp.array(num_gt)))
    for b in range(B):
        n = num_gt[b]
        assert (got[b, n:] == -1).all()
        if n:
            tb = total_benefit(benefit[b], got[b])
            assert abs(tb - scipy_optimal(benefit[b], n)) < 1e-4


def test_greedy_valid_and_close(rng):
    G, P, num_gt = 10, 120, 10
    benefit = rng.uniform(0, 1, size=(G, P)).astype(np.float32)
    got = np.asarray(matching.greedy_match(jnp.array(benefit), jnp.int32(num_gt)))
    active = got[:num_gt]
    assert (active >= 0).all()
    assert len(set(active.tolist())) == num_gt
    # Greedy is a 2-approximation for max-benefit matching.
    tb = total_benefit(benefit, got)
    opt = scipy_optimal(benefit, num_gt)
    assert tb >= opt / 2


def test_greedy_exact_on_dominant_diagonal():
    # Detection-like case: each gt has one clearly-best prior.
    benefit = np.full((4, 10), 0.05, dtype=np.float32)
    want = [7, 2, 9, 0]
    for i, j in enumerate(want):
        benefit[i, j] = 0.9
    got = np.asarray(matching.greedy_match(jnp.array(benefit), jnp.int32(4)))
    assert got.tolist() == want


def test_greedy_resolves_conflict_globally():
    # Two gts prefer prior 0; the higher-benefit gt must win it.
    benefit = np.array(
        [[0.9, 0.1, 0.0], [0.8, 0.5, 0.0]], dtype=np.float32
    )
    got = np.asarray(matching.greedy_match(jnp.array(benefit), jnp.int32(2)))
    assert got.tolist() == [0, 1]


def test_matching_targets_scatter(rng):
    gt = random_boxes(rng, 3)
    priors = random_boxes(rng, 12)
    assignment = jnp.array([5, 2, -1], dtype=jnp.int32)  # gt 2 padded
    conf_t, loc_t, matched = matching.matching_targets(
        assignment, jnp.array(gt), jnp.array(priors)
    )
    conf_t = np.asarray(conf_t)
    assert conf_t[5] == 1.0 and conf_t[2] == 1.0
    assert conf_t.sum() == 2.0
    np.testing.assert_allclose(
        np.asarray(loc_t[5]), gt[0] - priors[5], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loc_t[2]), gt[1] - priors[2], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(loc_t[0]), 0.0)
    assert np.asarray(matched).sum() == 2


def test_match_priors_end_to_end_jits(rng):
    gt = jnp.array(random_boxes(rng, 4))
    priors = jnp.array(random_boxes(rng, 32))
    fn = jax.jit(
        lambda g, n, p: matching.match_priors(g, n, p, method="greedy")
    )
    assignment, prior_gt, conf_t, loc_t, matched = fn(gt, jnp.int32(2), priors)
    assert assignment.shape == (4,)
    assert prior_gt.shape == (32,)
    assert np.asarray(assignment)[2:].tolist() == [-1, -1]
    assert np.asarray(conf_t).sum() == 2.0


def test_match_priors_batched_vmap(rng):
    B, G, P = 4, 5, 40
    gt = jnp.array(np.stack([random_boxes(rng, G) for _ in range(B)]))
    num_gt = jnp.array([5, 3, 0, 1], dtype=jnp.int32)
    priors = jnp.array(random_boxes(rng, P))
    fn = jax.vmap(
        lambda g, n: matching.match_priors(g, n, priors, method="greedy")
    )
    assignment, prior_gt, conf_t, loc_t, matched = fn(gt, num_gt)
    assert assignment.shape == (B, G)
    assert prior_gt.shape == (B, P)
    counts = np.asarray(conf_t).sum(axis=1)
    np.testing.assert_allclose(counts, [5, 3, 0, 1])


def test_hybrid_matching_prefers_confident_prior(rng):
    """1412.1441 §2.1 loss-aware matching: with two near-equal-IoU priors,
    the one already predicting high confidence wins under hybrid benefit."""
    gt = jnp.array([[0.4, 0.4, 0.6, 0.6]])
    priors = jnp.array([
        [0.40, 0.40, 0.60, 0.61],   # IoU ~0.95
        [0.40, 0.39, 0.60, 0.60],   # IoU ~0.95
        [0.0, 0.0, 0.1, 0.1],
    ])
    conf = jnp.array([-2.0, 2.0, -2.0])  # prior 1 is confident
    b_iou = matching.compute_benefit(gt, priors)
    b_hybrid = matching.compute_benefit(
        gt, priors, conf_logits=conf, conf_weight=0.5
    )
    pure = int(matching.greedy_match(b_iou, jnp.int32(1))[0])
    hybrid = int(matching.greedy_match(b_hybrid, jnp.int32(1))[0])
    assert hybrid == 1  # confidence term dominates the tiny IoU gap
    assert pure in (0, 1)


def test_hungarian_more_gt_than_priors(rng):
    """num_gt > P must not hang: only P rows get assigned, rest -1."""
    benefit = rng.uniform(0, 1, size=(6, 3)).astype(np.float32)
    got = np.asarray(matching.hungarian_match(jnp.array(benefit), jnp.int32(6)))
    assigned = got[got >= 0]
    assert len(assigned) == 3
    assert len(set(assigned.tolist())) == 3
    assert (got[3:] == -1).all()  # overflow rows unassigned


def test_greedy_more_gt_than_priors(rng):
    benefit = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    got = np.asarray(matching.greedy_match(jnp.array(benefit), jnp.int32(5)))
    assert (got >= 0).sum() == 2


def test_vmapped_hungarian_num_gt_overflow_terminates(rng):
    """Regression: under vmap, lax.cond runs BOTH branches, so the inactive-
    row branch of hungarian_match used to spin forever on an exhausted
    column set whenever any image had num_gt > P. Must terminate and match
    the unbatched results."""
    from tests.conftest import random_boxes
    from multibox_tpu.ops import matching as m

    priors = jnp.array(random_boxes(rng, 8))
    gts = jnp.stack(
        [jnp.array(random_boxes(rng, 12)) for _ in range(3)]
    )
    num_gt = jnp.array([12, 3, 9], jnp.int32)
    got = jax.vmap(
        lambda g, n: m.match_priors(g, n, priors, method="hungarian")[0]
    )(gts, num_gt)
    for b in range(3):
        want = m.match_priors(
            gts[b], num_gt[b], priors, method="hungarian"
        )[0]
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(want))
