"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 verdict item #1: the driver calls ``dryrun_multichip(8)`` BARE in a
fresh interpreter with one visible device; the function must self-provision
the 8-device fake CPU mesh. These tests reproduce the driver's invocation
exactly (fresh ``python -c``, no mesh env pre-staged).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_with_sigabrt_retry(code: str, env: dict):
    """Run the driver-style subprocess; retry ONCE on SIGABRT.

    The 8-device-compile child can abort under heavy host load (documented
    flake: XLA's thread pool hits rlimits while the full suite runs in
    parallel). A signal death is environmental, not a product failure —
    one retry keeps the suite honest without masking real crashes (a
    deterministic abort still fails on the retry)."""
    for attempt in range(2):
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=600,
        )
        if proc.returncode != -6:  # -6 = killed by SIGABRT
            return proc
    return proc


def _bare_env():
    """Env without any pre-staged mesh config (like the driver's, minus the
    real-TPU platform selection so tests stay off the axon relay)."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Keep the child off the experimental axon backend: tests must not
    # claim the real chip. The driver's process differs only in platform;
    # either way dryrun_multichip sees < 8 devices and must provision.
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_dryrun_bare_invocation_self_provisions():
    """Exactly the driver's call: backend NOT yet initialized → in-process
    provisioning (XLA_FLAGS + jax_platforms=cpu) must yield 8 devices."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = _run_with_sigabrt_retry(code, _bare_env())
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    assert "step ok" in proc.stdout, proc.stdout


def test_dryrun_after_backend_init_reexecs():
    """Backend already initialized with 1 device → must fall back to the
    subprocess re-exec path and still succeed."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) < 8; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = _run_with_sigabrt_retry(code, _bare_env())
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    assert "step ok" in proc.stdout, proc.stdout
