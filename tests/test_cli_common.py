"""cli.common env plumbing — the forced-CPU collective-deadline relax.

XLA:CPU kills the process 40 s into any cross-module collective whose
participants arrive staggered; on a 1-core host a big fake-mesh SPMD step
(coco_dp b256/8-device, round 5) staggers past that legitimately. CLI
entry points therefore widen the deadline via XLA_FLAGS whenever the CPU
platform is forced. These tests pin the env-mutation contract; the
behavior itself is exercised by the coco_dp demonstration run
(docs/PRODUCTION.md).
"""

import pytest

from multibox_tpu.cli.common import _relax_cpu_collective_deadline

pytestmark = pytest.mark.smoke


def test_forced_cpu_platform_widens_deadline(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    _relax_cpu_collective_deadline("cpu")
    flags = __import__("os").environ["XLA_FLAGS"]
    assert "--xla_cpu_collective_call_terminate_timeout_seconds=1800" in flags
    # the warn_stuck sibling is NOT registered with this jaxlib's
    # XLA_FLAGS parser (passing it aborts the process) — never emit it
    assert "warn_stuck" not in flags


def test_fake_mesh_flag_triggers_even_without_platform_override(monkeypatch):
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    _relax_cpu_collective_deadline(None)
    flags = __import__("os").environ["XLA_FLAGS"]
    assert flags.startswith("--xla_force_host_platform_device_count=8")
    assert "terminate_timeout_seconds=1800" in flags


def test_user_supplied_value_wins(monkeypatch):
    user = "--xla_cpu_collective_call_terminate_timeout_seconds=77"
    monkeypatch.setenv("XLA_FLAGS", user)
    _relax_cpu_collective_deadline("cpu")
    assert __import__("os").environ["XLA_FLAGS"] == user  # untouched


def test_tpu_platform_untouched(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    _relax_cpu_collective_deadline(None)  # no override, no fake mesh
    assert __import__("os").environ["XLA_FLAGS"] == ""


def test_env_tunable_timeout(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.setenv("MULTIBOX_CPU_COLLECTIVE_TIMEOUT_S", "300")
    _relax_cpu_collective_deadline("cpu")
    assert (
        "terminate_timeout_seconds=300"
        in __import__("os").environ["XLA_FLAGS"]
    )
