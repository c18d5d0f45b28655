"""Checkpointing via orbax: periodic saves + auto-resume.

Reproduces the reference's operational behavior (SURVEY.md §5.3/§5.4):
``tf.train.Saver`` periodic saves and Supervisor-style resume-from-latest
on restart, including the EMA shadow variables (they live inside
``TrainState.ema_params`` and are saved/restored with everything else).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, keep: int = 3, save_every: int = 1000,
                 async_save: Optional[bool] = None):
        """``async_save=None`` resolves by backend: async on an accelerator
        (the D2H/write overlap hides checkpoint cost behind training), but
        SYNCHRONOUS on the CPU backend. On a fake-multi-device CPU mesh the
        async save's D2H of the full state races the next program's
        collectives for the same oversubscribed cores, and XLA:CPU's
        collective rendezvous has a hard 40 s termination deadline — a
        measured b256/8-device run on a 1-core host died exactly there
        (`AllGatherThunk ... Termination timeout of 40 seconds exceeded`).
        Synchronous saves serialize the two phases and cost nothing on CPU,
        where there is no throughput to protect."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        if async_save is None:
            import jax

            async_save = jax.default_backend() != "cpu"
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_every,
                enable_async_checkpointing=bool(async_save),
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template``."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore as plain nested dicts/arrays WITHOUT a structure
        template — for cross-run warm-starts where the source TrainState's
        structure (optimizer, head shapes) differs from the target's."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
