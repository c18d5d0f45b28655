"""Checkpoint async/sync policy (utils/checkpoint.py).

On the CPU backend orbax's default ASYNC save is lethal under a
fake-multi-device mesh on few cores: the save's D2H of the full state
competes with the next program's collectives for the same threads, and
XLA:CPU's collective rendezvous aborts the process after a hard 40 s
("AllGatherThunk ... Termination timeout ... exceeded" — observed on the
coco_dp b256/8-device demonstration run, round 5). The manager therefore
resolves ``async_save=None`` to synchronous on CPU, async elsewhere, with
an explicit override in both directions.
"""

import jax
import numpy as np
import pytest

from multibox_tpu.utils.checkpoint import CheckpointManager

pytestmark = pytest.mark.smoke


def _enable_async(mgr: CheckpointManager) -> bool:
    # orbax keeps the resolved options on the underlying manager
    return bool(mgr._mgr._options.enable_async_checkpointing)


def test_cpu_backend_defaults_to_synchronous_saves(tmp_path):
    assert jax.default_backend() == "cpu"  # conftest forces CPU
    mgr = CheckpointManager(str(tmp_path))
    assert _enable_async(mgr) is False


@pytest.mark.parametrize("flag", [True, False])
def test_explicit_override_wins(tmp_path, flag):
    mgr = CheckpointManager(str(tmp_path), async_save=flag)
    assert _enable_async(mgr) is flag


def test_synchronous_save_roundtrips(tmp_path):
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    mgr = CheckpointManager(str(tmp_path), save_every=1, async_save=False)
    assert mgr.save(1, state)
    # synchronous: the checkpoint is durable immediately, no waiting
    restored = CheckpointManager(str(tmp_path)).restore(
        {"w": np.zeros((2, 3), np.float32)}
    )
    np.testing.assert_array_equal(restored["w"], state["w"])
