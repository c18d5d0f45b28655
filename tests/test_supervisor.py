"""Supervisor semantics of the train CLI (``--restart_every_steps``):
bounded-lifetime child processes with crash auto-restart from the last
checkpoint — the tf.train.Supervisor behavior (SURVEY.md §5.3), and the
mitigation for host-RAM leaks in long runs (Config.restart_every_steps).

Unit tests inject a fake child; the e2e test lives in
test_cli_end_to_end.py::test_17 (real processes, real checkpoints).
"""

import os

from multibox_tpu.cli.train import _latest_ckpt_step, _strip_flag, _supervise

ARGV = ["--tfrecords", "t.tfrecord", "--priors", "p.pkl",
        "--logdir", "LOGDIR", "--no_mesh"]


def _mark_step(logdir, step):
    os.makedirs(os.path.join(str(logdir), str(step)), exist_ok=True)


def test_latest_ckpt_step(tmp_path):
    assert _latest_ckpt_step(str(tmp_path / "missing")) == 0
    assert _latest_ckpt_step(str(tmp_path)) == 0
    _mark_step(tmp_path, 3)
    _mark_step(tmp_path, 10)
    (tmp_path / "plugins").mkdir()  # non-step dirs ignored
    (tmp_path / "7").write_text("")  # step-named FILE ignored
    assert _latest_ckpt_step(str(tmp_path)) == 10


def test_strip_flag_both_forms():
    argv = ["--a", "1", "--restart_every_steps", "5", "--b",
            "--restart_every_steps=9", "--c", "2"]
    assert _strip_flag(argv, "--restart_every_steps") == [
        "--a", "1", "--b", "--c", "2"
    ]


def test_supervise_chains_children_to_total(tmp_path):
    """Children cover [done, done+restart] until total; the original argv
    passes through verbatim (minus the supervisor/step flags) so future
    train flags are never silently dropped."""
    targets = []

    def child(argv):
        # Original flags preserved, supervisor flag overridden to 0, and
        # the LR-schedule horizon pinned to the FULL run length (children
        # stop early but must anneal on the same curve).
        assert "--no_mesh" in argv and "LOGDIR" in argv
        assert argv[argv.index("--restart_every_steps") + 1] == "0"
        assert argv[argv.index("--schedule_total_steps") + 1] == "7"
        target = int(argv[argv.index("--max_number_of_steps") + 1])
        targets.append(target)
        _mark_step(tmp_path, target)
        return 0

    argv = ARGV + ["--restart_every_steps", "3", "--max_number_of_steps", "99"]
    assert _supervise(argv, str(tmp_path), total=7, restart=3,
                      run_child=child) == 0
    assert targets == [3, 6, 7]


def test_supervise_restarts_crashed_child_with_progress(tmp_path):
    """A child that dies AFTER checkpointing progress is restarted (exit
    code ignored) — the Supervisor crash-resume semantic."""
    calls = []

    def child(argv):
        target = int(argv[argv.index("--max_number_of_steps") + 1])
        calls.append(target)
        if len(calls) == 1:
            _mark_step(tmp_path, 2)  # crashed at step 2 of [0, 4]
            return -11
        _mark_step(tmp_path, target)
        return 0

    assert _supervise(ARGV, str(tmp_path), total=8, restart=4,
                      run_child=child) == 0
    # Crash at 2 → next child re-targets 2+4=6, then 8.
    assert calls == [4, 6, 8]


def test_supervise_aborts_after_three_zero_progress_children(tmp_path):
    calls = []

    def child(argv):
        calls.append(1)
        return 1  # dies without ever saving

    assert _supervise(ARGV, str(tmp_path), total=5, restart=5,
                      run_child=child) == 1
    assert len(calls) == 3


def test_supervise_resumes_past_existing_checkpoint(tmp_path):
    """A pre-existing checkpoint short-circuits completed work (re-running
    a finished supervisor command is a no-op)."""
    _mark_step(tmp_path, 9)
    calls = []

    def child(argv):
        calls.append(int(argv[argv.index("--max_number_of_steps") + 1]))
        _mark_step(tmp_path, calls[-1])
        return 0

    assert _supervise(ARGV, str(tmp_path), total=12, restart=10,
                      run_child=child) == 0
    assert calls == [12]
    assert _supervise(ARGV, str(tmp_path), total=12, restart=10,
                      run_child=child) == 0
    assert calls == [12]  # nothing left to do
