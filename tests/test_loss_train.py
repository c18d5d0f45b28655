"""Loss correctness (hand-computed oracle) + overfit-one-batch train test
(SURVEY.md §4/§7 step 5) + data-parallel step on the fake 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.train.loss import multibox_loss, optax_sigmoid_bce
from tests.conftest import random_boxes


def test_sigmoid_bce_matches_naive():
    logits = jnp.array([-5.0, -0.5, 0.0, 0.5, 5.0])
    labels = jnp.array([0.0, 1.0, 0.0, 1.0, 1.0])
    p = jax.nn.sigmoid(logits)
    naive = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    np.testing.assert_allclose(
        np.asarray(optax_sigmoid_bce(logits, labels)), np.asarray(naive), atol=1e-6
    )


def test_loss_hand_computed():
    # 1 image, 3 priors, 1 gt that exactly overlaps prior 0.
    priors = jnp.array(
        [[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9], [0.0, 0.6, 0.3, 0.95]]
    )
    gt = jnp.array([[[0.1, 0.1, 0.4, 0.4]]])  # == prior 0
    num_gt = jnp.array([1], jnp.int32)
    # Predictions: offsets zero (perfect for matched prior), logits chosen.
    loc_preds = jnp.zeros((1, 3, 4))
    conf = jnp.array([[2.0, -1.0, -3.0]])

    total, metrics = multibox_loss(
        loc_preds, conf, gt, num_gt, priors, alpha=1.0, hard_negative_ratio=0.0
    )
    # matched prior = 0 (IoU 1). loc target = gt - prior = 0 → loc loss 0.
    assert float(metrics["loss_loc"]) == pytest.approx(0.0, abs=1e-7)
    # conf loss: pos: -log σ(2); negs (all kept): -log(1-σ(-1)) - log(1-σ(-3))
    want = -np.log(1 / (1 + np.exp(-2.0)))
    want += -np.log(1 - 1 / (1 + np.exp(1.0)))
    want += -np.log(1 - 1 / (1 + np.exp(3.0)))
    assert float(metrics["loss_conf"]) == pytest.approx(want, rel=1e-5)
    assert float(metrics["num_pos"]) == 1.0


def test_loss_location_term():
    priors = jnp.array([[0.2, 0.2, 0.6, 0.6]])
    gt = jnp.array([[[0.3, 0.25, 0.7, 0.65]]])  # offset = (0.1,0.05,0.1,0.05)
    loc_preds = jnp.zeros((1, 1, 4))
    conf = jnp.array([[0.0]])
    total, metrics = multibox_loss(
        loc_preds, conf, gt, jnp.array([1], jnp.int32), priors,
        alpha=2.0, hard_negative_ratio=0.0,
    )
    want_loc = 0.5 * (0.1**2 + 0.05**2 + 0.1**2 + 0.05**2)
    assert float(metrics["loss_loc"]) == pytest.approx(want_loc, rel=1e-5)
    assert float(total) == pytest.approx(
        float(metrics["loss_conf"]) + 2.0 * want_loc, rel=1e-5
    )


def test_hard_negative_mining_keeps_ratio():
    P = 50
    priors = jnp.array(random_boxes(np.random.default_rng(1), P))
    gt = jnp.array(random_boxes(np.random.default_rng(2), 2))[None]
    conf = jnp.array(np.random.default_rng(3).normal(0, 1, (1, P)).astype(np.float32))
    _, metrics = multibox_loss(
        jnp.zeros((1, P, 4)), conf, gt, jnp.array([2], jnp.int32), priors,
        hard_negative_ratio=3.0,
    )
    # 2 positives → keep 6 negatives.
    assert float(metrics["num_pos"]) == 2.0
    assert float(metrics["num_neg_kept"]) == pytest.approx(6.0)


def test_zero_gt_image_pushes_background():
    P = 10
    priors = jnp.array(random_boxes(np.random.default_rng(1), P))
    conf = jnp.full((1, P), 3.0)  # everything confidently foreground (wrong)
    total, metrics = multibox_loss(
        jnp.zeros((1, P, 4)), conf,
        jnp.zeros((1, 4, 4)), jnp.array([0], jnp.int32), priors,
        hard_negative_ratio=3.0,
    )
    assert float(metrics["num_pos"]) == 0.0
    assert float(total) > 0.0  # at least one hard negative contributes
    assert np.isfinite(float(total))


def test_loss_gradients_flow():
    P = 12
    rng = np.random.default_rng(0)
    priors = jnp.array(random_boxes(rng, P))
    gt = jnp.array(random_boxes(rng, 3))[None]

    def f(loc, conf):
        total, _ = multibox_loss(
            loc, conf, gt, jnp.array([3], jnp.int32), priors
        )
        return total

    loc = jnp.array(rng.normal(0, 0.1, (1, P, 4)).astype(np.float32))
    conf = jnp.array(rng.normal(0, 1, (1, P)).astype(np.float32))
    gloc, gconf = jax.grad(f, argnums=(0, 1))(loc, conf)
    assert np.isfinite(np.asarray(gloc)).all()
    assert np.isfinite(np.asarray(gconf)).all()
    assert float(jnp.abs(gloc).sum()) > 0
    assert float(jnp.abs(gconf).sum()) > 0


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Config(
        input_size=75, num_priors=8, batch_size=2, max_num_bboxes=3,
        compute_dtype="float32", initial_learning_rate=0.003,
        hard_negative_ratio=3.0, num_train_examples=2,
    )
    from multibox_tpu.inference import build_model
    from multibox_tpu.train import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    priors = np.sort(rng.uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32), axis=1
                     ).reshape(8, 4)
    model = build_model(cfg, 8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 8)
    step = make_train_step(cfg, model, jnp.asarray(priors))
    batch = {
        "images": rng.normal(0, 0.5, (2, 75, 75, 3)).astype(np.float32),
        "boxes": np.stack([random_boxes(rng, 3), random_boxes(rng, 3)]),
        "num_boxes": np.array([3, 2], np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, model, state, step, batch


@pytest.mark.slow
def test_overfit_one_batch(tiny_setup):
    cfg, model, state, step, batch = tiny_setup
    jstep = jax.jit(step)
    state, m0 = jstep(state, batch)
    first = float(m0["loss"])
    for _ in range(60):
        state, metrics = jstep(state, batch)
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 61
    # EMA shadows should have moved toward (but not equal) params.
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_parallel_step_on_fake_mesh(tiny_setup):
    """Data-parallel train step on the 8-device CPU mesh: replicated state,
    sharded batch, one step — state stays replicated and finite."""
    from multibox_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate_state, shard_batch,
    )

    cfg, model, state, step, batch = tiny_setup
    state = jax.tree.map(jnp.copy, state)  # pstep donates its input
    prev_step = int(state.step)
    assert len(jax.devices()) == 8
    mesh = make_mesh(jax.devices())
    pstep = make_parallel_train_step(step, mesh)
    # Batch of 8 (1 per device).
    rng = np.random.default_rng(5)
    big = {
        "images": jnp.asarray(rng.normal(0, 0.5, (8, 75, 75, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.stack([random_boxes(rng, 3) for _ in range(8)])),
        "num_boxes": jnp.asarray(np.full((8,), 2, np.int32)),
    }
    state = replicate_state(state, mesh)
    big = shard_batch(big, mesh)
    new_state, metrics = pstep(state, big)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == prev_step + 1


def test_parallel_matches_single_device():
    """DP over 8 devices must produce the same grads/update as
    single-device on the same global batch.

    Uses a small BN-free conv model: with train-mode BatchNorm the deep
    Inception backbone is chaotically sensitive to float32 reduction order
    (ReLU-mask flips), which would make bitwise comparison meaningless —
    the DP *mechanics* (sharding, derived all-reduce, optimizer) are what
    this test pins down. The full detector gets its own DP smoke test
    above; loss equality there already matches to 1e-4.
    """
    import flax.linen as nn
    from multibox_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated, shard_batch,
    )
    from multibox_tpu.train.loss import multibox_loss

    P = 8

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            out = nn.Dense(P * 5)(x)
            return out[:, : P * 4].reshape(-1, P, 4), out[:, P * 4 :]

    rng = np.random.default_rng(9)
    priors = jnp.asarray(
        np.sort(rng.uniform(0.05, 0.95, (P, 2, 2)).astype(np.float32), axis=1
                ).reshape(P, 4))
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    batch = {
        "images": jnp.asarray(rng.normal(0, 0.5, (8, 32, 32, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.stack([random_boxes(rng, 3) for _ in range(8)])),
        "num_boxes": jnp.asarray(np.full((8,), 2, np.int32)),
    }

    def loss_fn(params, batch):
        loc, conf = model.apply(params, batch["images"])
        total, _ = multibox_loss(
            loc, conf, batch["boxes"], batch["num_boxes"], priors
        )
        return total

    gfn = jax.value_and_grad(loss_fn)
    l1, g1 = jax.jit(gfn)(params, batch)

    mesh = make_mesh(jax.devices())
    rs, bs = replicated(mesh), batch_sharding(mesh)
    pgfn = jax.jit(gfn, in_shardings=(rs, bs), out_shardings=(rs, rs))
    l2, g2 = pgfn(jax.device_put(params, rs), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_parallel_detect_on_fake_mesh(tiny_setup):
    """Sharded batched detection over the 8-device mesh matches
    single-device results exactly (inference mode: no BN chaos)."""
    from multibox_tpu.inference import make_detect_fn, build_model, postprocess
    from multibox_tpu.parallel.mesh import (
        make_mesh, make_parallel_detect_fn, replicated, shard_batch,
    )

    cfg, model, state, step, batch = tiny_setup
    rng = np.random.default_rng(11)
    priors = jnp.asarray(np.sort(
        rng.uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32), axis=1
    ).reshape(8, 4))

    def detect(variables, images):
        loc, conf = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, images, train=False)
        return postprocess(loc, conf, priors, cfg)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = jnp.asarray(rng.uniform(-1, 1, (8, 75, 75, 3)).astype(np.float32))
    want = jax.jit(detect)(variables, images)

    mesh = make_mesh(jax.devices())
    pdetect = make_parallel_detect_fn(detect, mesh)
    got = pdetect(
        jax.device_put(variables, replicated(mesh)), shard_batch(images, mesh)
    )
    np.testing.assert_allclose(
        np.asarray(got["boxes"]), np.asarray(want["boxes"]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got["num"]), np.asarray(want["num"]))


def test_remat_train_step_matches(tiny_setup):
    """cfg.remat recomputes activations: same update, less memory."""
    import dataclasses
    from multibox_tpu.train import create_train_state, make_train_step

    cfg, model, state, step, batch = tiny_setup
    cfg_r = dataclasses.replace(cfg, remat=True)
    state_a = create_train_state(cfg, model, jax.random.PRNGKey(4), 8)
    state_b = jax.tree.map(jnp.copy, state_a)
    priors = jnp.asarray(np.sort(
        np.random.default_rng(0).uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32),
        axis=1).reshape(8, 4))
    sa, ma = jax.jit(make_train_step(cfg, model, priors))(state_a, batch)
    sb, mb = jax.jit(make_train_step(cfg_r, model, priors))(state_b, batch)
    # remat moves XLA fusion boundaries; train-mode BN reductions reorder,
    # so f32 outputs agree only approximately (same chaos as the DP test).
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=2e-2)
    assert np.isfinite(float(mb["loss"]))
    assert int(sb.step) == int(sa.step)


def test_chunked_step_matches_sequential(rng):
    """make_chunked_step (lax.scan over a K-batch superbatch) must consume
    the same data in the same order with the same per-step keys as K
    sequential steps. Pinned at lr=0 where the trajectories are
    bit-comparable: with lr>0, the scanned and straight-line programs
    compile separately, and float-reassociation-level differences in the
    very first update get amplified by the loss sharpness (measured: 1e-4
    param noise → ~0.2% loss shift next step → ~8% two steps later), so
    any lr>0 loss comparison is inherently flaky."""
    import jax
    import jax.numpy as jnp

    from multibox_tpu.config import Config
    from multibox_tpu.inference import build_model
    from multibox_tpu.train import create_train_state
    from multibox_tpu.train.loop import (
        make_augmented_train_step,
        make_chunked_step,
    )

    cfg = Config(
        input_size=75, num_priors=16, batch_size=2, max_num_bboxes=4,
        compute_dtype="float32", augment=False,
        initial_learning_rate=0.0, rmsprop_momentum=0.0,
    )
    priors = jnp.array(
        np.sort(rng.uniform(0, 1, (16, 2, 2)).astype(np.float32), axis=1)
        .reshape(16, 4)
    )
    model = build_model(cfg, 16)
    state0 = create_train_state(cfg, model, jax.random.PRNGKey(0), 16)
    step_fn = make_augmented_train_step(cfg, model, priors)

    batches = []
    for _ in range(4):
        batches.append({
            "images": rng.integers(0, 255, (2, 75, 75, 3)).astype(np.uint8),
            "boxes": np.sort(
                rng.uniform(0, 1, (2, 4, 2, 2)).astype(np.float32), axis=2
            ).reshape(2, 4, 4),
            "num_boxes": np.full((2,), 2, np.int32),
        })

    pstep = jax.jit(step_fn)
    s_seq = state0
    for b in batches:
        s_seq, m_seq = pstep(s_seq, jax.device_put(b))

    cstep = jax.jit(make_chunked_step(step_fn, 2))
    s_chunk = state0
    for k in range(0, 4, 2):
        sb = {
            key: np.stack([b[key] for b in batches[k:k + 2]])
            for key in batches[0]
        }
        s_chunk, m_chunk = cstep(s_chunk, jax.device_put(sb))

    assert int(s_chunk.step) == int(s_seq.step) == 4
    np.testing.assert_allclose(
        float(m_chunk["loss"]), float(m_seq["loss"]), rtol=1e-6
    )
    # BN batch_stats DO update at lr=0 — their agreement pins data
    # order/content equality through the scan.
    for a, b in zip(jax.tree.leaves(s_seq.batch_stats),
                    jax.tree.leaves(s_chunk.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


# ---- optimizer family + gradient clipping (slim train surface) ----

def test_make_optimizer_families_step():
    """Every cfg.optimizer choice produces a usable optax transform."""
    from multibox_tpu.train.state import make_optimizer

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
    for name in ("rmsprop", "momentum", "sgd", "adam"):
        cfg = Config(optimizer=name, initial_learning_rate=0.1)
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        new = jax.tree.map(lambda p, u: p + u, params, updates)
        assert np.all(np.isfinite(new["w"]))
        assert not np.allclose(new["w"], params["w"])  # it moved
    with pytest.raises(ValueError):
        make_optimizer(Config(optimizer="adagrad"))


def test_clip_gradient_norm_bounds_update():
    """With sgd the update is exactly -lr * clipped_grad, so the update
    norm must be lr * min(grad_norm, clip)."""
    from multibox_tpu.train.state import make_optimizer

    lr = 0.5
    params = {"w": jnp.zeros((3,), jnp.float32)}
    grads = {"w": jnp.asarray([30.0, 40.0, 0.0], jnp.float32)}  # norm 50
    for clip, expected in ((2.0, lr * 2.0), (0.0, lr * 50.0)):
        cfg = Config(
            optimizer="sgd", initial_learning_rate=lr,
            clip_gradient_norm=clip, warmup_steps=0,
        )
        tx = make_optimizer(cfg)
        updates, _ = tx.update(grads, tx.init(params), params)
        norm = float(jnp.linalg.norm(updates["w"]))
        assert norm == pytest.approx(expected, rel=1e-5), (clip, norm)


def test_train_wires_step_bound_into_schedule_horizon(monkeypatch, tmp_path):
    """The LR schedule must anneal over the ACTUAL run length: max_steps
    sets the horizon, and schedule_total overrides it for bounded child
    invocations chained by the supervisor."""
    from multibox_tpu.train import loop

    captured = {}

    def capture_cfg(cfg, model, rng, num_priors):
        captured["cfg"] = cfg
        raise RuntimeError("stop after capture")

    monkeypatch.setattr(loop, "create_train_state", capture_cfg)
    cfg = Config(lr_schedule="cosine", max_number_of_steps=100000)
    priors = np.zeros((4, 4), np.float32)
    with pytest.raises(RuntimeError):
        loop.train(cfg, ["x.tfrecord"], priors, str(tmp_path), max_steps=123)
    assert captured["cfg"].max_number_of_steps == 123
    with pytest.raises(RuntimeError):
        loop.train(cfg, ["x.tfrecord"], priors, str(tmp_path),
                   max_steps=5, schedule_total=777)
    assert captured["cfg"].max_number_of_steps == 777
    assert cfg.max_number_of_steps == 100000  # caller's cfg untouched


def _tiny_bnfree_setup(batch_size, grad_accum_steps=1):
    """BN-free tiny detector + train state for EXACT grad-accum parity.

    With train-mode BatchNorm the deep backbone is chaotically sensitive
    to float32 reduction order (see test_dp_grads_match_single_device's
    docstring — measured here too: loss([mb; mb]) vs loss(mb) differs ~1%
    through the full Inception at random init), so the accumulation
    MECHANICS are pinned bitwise-tight on a model whose forward is
    per-image independent; the full model gets a tolerance test below.
    """
    import dataclasses
    import flax.linen as nn
    from multibox_tpu.train import create_train_state, make_train_step

    P = 8

    class TinyDet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            out = nn.Dense(P * 5)(x)
            return out[:, : P * 4].reshape(-1, P, 4), out[:, P * 4 :]

    cfg = Config(
        input_size=32, num_priors=P, batch_size=batch_size,
        max_num_bboxes=3, compute_dtype="float32",
        grad_accum_steps=grad_accum_steps, num_train_examples=batch_size,
    )
    rng = np.random.default_rng(9)
    priors = jnp.asarray(
        np.sort(rng.uniform(0.05, 0.95, (P, 2, 2)).astype(np.float32), axis=1
                ).reshape(P, 4))
    model = TinyDet()
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), P)
    step = jax.jit(make_train_step(cfg, model, priors))
    batch = {
        "images": jnp.asarray(
            rng.normal(0, 0.5, (batch_size, 32, 32, 3)).astype(np.float32)),
        "boxes": jnp.asarray(
            np.stack([random_boxes(rng, 3) for _ in range(batch_size)])),
        "num_boxes": jnp.asarray(np.full((batch_size,), 2, np.int32)),
    }
    return state, step, batch


def test_grad_accum_matches_full_batch():
    """grad_accum_steps=A averages A microbatch grads into ONE update —
    on a per-image-independent (BN-free) model this must equal the plain
    full-batch update up to reduction-order rounding, and the num_*
    metrics must SUM back to full-batch counts."""
    state_a, step_a, batch = _tiny_bnfree_setup(8, grad_accum_steps=4)
    state_b, step_b, _ = _tiny_bnfree_setup(8)
    sa, ma = step_a(state_a, batch)
    sb, mb = step_b(state_b, batch)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    assert float(ma["num_pos"]) == float(mb["num_pos"])
    assert float(ma["num_neg_kept"]) == float(mb["num_neg_kept"])
    assert float(ma["num_gt_dropped"]) == float(mb["num_gt_dropped"])
    for pa, pb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-6
        )
    # EMA follows params, so it must agree too.
    for ea, eb in zip(jax.tree.leaves(sa.ema_params),
                      jax.tree.leaves(sb.ema_params)):
        np.testing.assert_allclose(
            np.asarray(ea), np.asarray(eb), rtol=1e-4, atol=1e-6
        )
    assert int(sa.step) == int(sb.step) == 1


def test_grad_accum_full_model(tiny_setup):
    """Full detector (train-mode BN) under grad accumulation: the loss
    agrees with the plain step at the documented BN-chaos tolerance (the
    remat/DP tests' regime), counts sum to full-batch values, and the
    running stats took A momentum updates (they must differ from one)."""
    import dataclasses
    from multibox_tpu.train import create_train_state, make_train_step

    cfg, model, _, _, batch = tiny_setup
    dup = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), batch)
    priors = jnp.asarray(np.sort(
        np.random.default_rng(0).uniform(0.05, 0.95, (8, 2, 2)).astype(np.float32),
        axis=1).reshape(8, 4))

    cfg_a = dataclasses.replace(cfg, batch_size=4, grad_accum_steps=2)
    cfg_b = dataclasses.replace(cfg, batch_size=4)
    state_a = create_train_state(cfg_a, model, jax.random.PRNGKey(4), 8)
    state_b = jax.tree.map(jnp.copy, state_a)
    sa, ma = jax.jit(make_train_step(cfg_a, model, priors))(state_a, dup)
    sb, mb = jax.jit(make_train_step(cfg_b, model, priors))(state_b, dup)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=2e-2)
    assert float(ma["num_pos"]) == float(mb["num_pos"])
    assert int(sa.step) == 1
    # BN running stats moved (two momentum updates vs one — not equal,
    # but both must have left their init values).
    va = jax.tree.leaves(sa.batch_stats)[0]
    vb = jax.tree.leaves(sb.batch_stats)[0]
    assert not np.allclose(np.asarray(va), np.asarray(jax.tree.leaves(state_b.batch_stats)[0]))
    assert np.isfinite(np.asarray(va)).all() and np.isfinite(np.asarray(vb)).all()


def test_grad_accum_divisibility_raises(tiny_setup):
    import dataclasses
    from multibox_tpu.train import create_train_state, make_train_step

    cfg, model, state, _, batch = tiny_setup  # batch dim 2
    cfg_a = dataclasses.replace(cfg, grad_accum_steps=3)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        jax.jit(make_train_step(cfg_a, model, jnp.zeros((8, 4))))(state, batch)
