"""multibox-doctor preflight checks (cli/doctor.py).

The doctor is the operational failure-detection entry point (SURVEY.md §5):
its one irreplaceable job is turning the platform's worst failure mode — a
relay outage where ``jax.devices()`` hangs FOREVER instead of raising —
into a bounded, diagnosable failure. These tests pin every status path
(ok / warn / fail / hang) without ever touching a real backend: the device
probe source is swapped for tiny stand-in subprocesses, including a
sleeping child to pin the hard-timeout kill.
"""

import json
import sys

import pytest

from multibox_tpu.cli import doctor

pytestmark = pytest.mark.smoke


# ---------------------------------------------------------------- device

def test_device_probe_hang_is_killed_and_failed(monkeypatch):
    # A child that sleeps past the budget = the relay-outage signature.
    monkeypatch.setattr(doctor, "_PROBE_SRC", "import time; time.sleep(60)")
    status, name, detail = doctor.check_device(timeout_s=1.0)
    assert (status, name) == ("fail", "device")
    assert "hung" in detail and "killed" in detail


def test_device_probe_crash_reports_stderr_tail(monkeypatch):
    monkeypatch.setattr(
        doctor, "_PROBE_SRC",
        "import sys; print('boom: no backend', file=sys.stderr); sys.exit(3)")
    status, name, detail = doctor.check_device(timeout_s=30.0)
    assert (status, name) == ("fail", "device")
    assert "exited 3" in detail and "boom: no backend" in detail


def test_device_probe_wrong_arithmetic_fails(monkeypatch):
    bad = json.dumps({"value": 0.0, "platform": "cpu", "device_kind": "x",
                      "n_devices": 1, "elapsed_s": 0.1})
    monkeypatch.setattr(doctor, "_PROBE_SRC", f"print('{bad}')")
    status, _, detail = doctor.check_device(timeout_s=30.0)
    assert status == "fail" and "wrong arithmetic" in detail


def test_device_probe_garbage_output_fails(monkeypatch):
    monkeypatch.setattr(doctor, "_PROBE_SRC", "print('not json')")
    status, _, detail = doctor.check_device(timeout_s=30.0)
    assert status == "fail" and "unparseable" in detail


def test_device_probe_ok_and_slow_warn(monkeypatch):
    def fake(elapsed):
        payload = json.dumps({"value": 64.0, "platform": "cpu",
                              "device_kind": "fake", "n_devices": 8,
                              "elapsed_s": elapsed})
        return f"print('{payload}')"

    monkeypatch.setattr(doctor, "_PROBE_SRC", fake(0.5))
    status, _, detail = doctor.check_device(timeout_s=30.0)
    assert status == "ok" and "8x fake" in detail

    # >60s compile+execute = relay under load: degrade to warn, not fail.
    monkeypatch.setattr(doctor, "_PROBE_SRC", fake(61.0))
    status, _, detail = doctor.check_device(timeout_s=30.0)
    assert status == "warn" and "slow" in detail


# ------------------------------------------------------------ host checks

def test_python_deps_ok():
    status, name, detail = doctor.check_python_deps()
    assert (status, name) == ("ok", "python-deps")
    assert "jax" in detail and "flax" in detail


def test_tfrecord_roundtrip_ok():
    status, name, detail = doctor.check_tfrecord_roundtrip()
    assert (status, name) == ("ok", "tfrecord-roundtrip")


def test_native_layer_probe_matches_module_state():
    # Must agree with the module's own availability — and NEVER fail
    # (a missing .so is a perf warning, not a broken install).
    from multibox_tpu.data import _native

    status, name, detail = doctor.check_native_layer()
    assert name == "native-layer"
    if _native.available():
        assert status == "ok" and "loaded" in detail
    else:
        assert status == "warn" and "not built" in detail


def test_xla_cache_missing_dir_warns(monkeypatch, tmp_path):
    monkeypatch.setenv("MULTIBOX_XLA_CACHE", str(tmp_path / "nope"))
    status, _, detail = doctor.check_xla_cache()
    assert status == "warn" and "does not exist" in detail


def test_xla_cache_present_ok(monkeypatch, tmp_path):
    (tmp_path / "entry").write_bytes(b"x" * 10)
    monkeypatch.setenv("MULTIBOX_XLA_CACHE", str(tmp_path))
    status, _, detail = doctor.check_xla_cache()
    assert status == "ok" and "1 entries" in detail


def test_platform_config_warns_on_env_only(monkeypatch):
    # The documented trap: JAX_PLATFORMS alone does not stick when a
    # sitecustomize registers plugins at startup.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("MULTIBOX_JAX_PLATFORM", raising=False)
    status, _, detail = doctor.check_platform_config()
    assert status == "warn" and "MULTIBOX_JAX_PLATFORM" in detail

    monkeypatch.setenv("MULTIBOX_JAX_PLATFORM", "cpu")
    status, _, _ = doctor.check_platform_config()
    assert status == "ok"


# ------------------------------------------------------------------ main

def test_main_json_skip_device(capsys):
    rc = doctor.main(["--skip_device", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"ok", "checks"}
    names = [c["name"] for c in out["checks"]]
    assert "device" not in names
    assert {"python-deps", "platform-config", "xla-cache", "native-layer",
            "tfrecord-roundtrip"} <= set(names)
    # host-side checks can warn but never fail in this container
    assert all(c["status"] != "fail" for c in out["checks"])
    assert rc == 0 and out["ok"] is True


def test_main_exit_code_reflects_failure(monkeypatch, capsys):
    monkeypatch.setattr(doctor, "_PROBE_SRC", "import sys; sys.exit(1)")
    rc = doctor.main(["--device_timeout", "30", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and out["ok"] is False
    statuses = {c["name"]: c["status"] for c in out["checks"]}
    assert statuses["device"] == "fail"


def test_main_human_output_lines(capsys):
    rc = doctor.main(["--skip_device"])
    captured = capsys.readouterr()
    assert rc == 0
    for line in captured.out.strip().splitlines():
        assert line.startswith(("[ok]", "[warn]", "[fail]"))
    assert "all checks passed" in captured.err


def test_console_script_registered():
    # Shipped-unreachable is the failure mode this pins (round-4 weak #2):
    # the module must be wired as a console script by its documented name.
    import tomllib

    with open("pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert scripts.get("multibox-doctor") == "multibox_tpu.cli.doctor:main"
