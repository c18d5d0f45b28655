"""Warm-start from an orbax logdir (VERDICT round-2 item #6): the backbone
subtree (EMA weights) of a previous run grafts into a fresh state; the head
stays freshly initialized — the reference's restore-with-head-scopes-
excluded behavior (SURVEY.md §3.1) for self-trained checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.inference import build_model
from multibox_tpu.train.loop import _restore_pretrained
from multibox_tpu.train.state import create_train_state
from multibox_tpu.utils.checkpoint import CheckpointManager


def _make_state(num_priors, seed=0, num_classes=1):
    cfg = Config(input_size=75, num_priors=num_priors,
                 num_classes=num_classes, compute_dtype="float32")
    model = build_model(cfg, num_priors)
    return create_train_state(cfg, model, jax.random.PRNGKey(seed), num_priors)


def test_warm_start_grafts_backbone_keeps_head(tmp_path):
    src = _make_state(8, seed=1)
    # make EMA distinguishable from params (EMA is what must be grafted)
    src = src.replace(
        ema_params=jax.tree.map(lambda p: p + 0.5, src.params)
    )
    logdir = str(tmp_path / "src_run")
    mgr = CheckpointManager(logdir, save_every=1)
    mgr.save(1, src, force=True)
    mgr.wait()
    mgr.close()

    # different head shape (num_priors) AND different init seed
    dst = _make_state(4, seed=2)
    head_before = jax.tree.map(np.asarray, dst.params["MultiBoxHead"])
    out = _restore_pretrained(dst, logdir)

    # backbone == source EMA
    got = jax.tree.leaves(out.params["InceptionV3"])
    want = jax.tree.leaves(src.ema_params["InceptionV3"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)
    # head untouched (fresh init)
    for g, w in zip(
        jax.tree.leaves(out.params["MultiBoxHead"]),
        jax.tree.leaves(head_before),
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # EMA shadows re-seeded from the grafted params
    for g, w in zip(
        jax.tree.leaves(out.ema_params["InceptionV3"]),
        jax.tree.leaves(out.params["InceptionV3"]),
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # batch_stats grafted too
    for g, w in zip(
        jax.tree.leaves(out.batch_stats["InceptionV3"]),
        jax.tree.leaves(src.batch_stats["InceptionV3"]),
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_warm_start_rejects_mismatched_backbone(tmp_path):
    src = _make_state(8)
    logdir = str(tmp_path / "src_run")
    mgr = CheckpointManager(logdir, save_every=1)
    mgr.save(1, src, force=True)
    mgr.wait()
    mgr.close()

    cfg = Config(input_size=75, num_priors=8, backbone="mobilenet_v2",
                 compute_dtype="float32",
                 ssd_endpoints=("Stage_2", "Stage_4", "Stage_6"))
    model = build_model(cfg, 8)
    dst = create_train_state(cfg, model, jax.random.PRNGKey(0), 8)
    with pytest.raises(ValueError, match="backbone scope"):
        _restore_pretrained(dst, logdir)
