"""multibox-doctor — environment and deployment health checks.

Operational failure-detection tooling (SURVEY.md §5 "failure detection"):
one `[ok]/[warn]/[fail]` line per check, exit 0 iff nothing fails,
`--json` for machine consumption (monitoring hooks, pre-flight gates in
training supervisors).

The device check runs in a SUBPROCESS under a hard timeout, because an
unreachable TPU relay does not raise — `jax.devices()` and the first
execution simply hang forever (observed outage windows: SURVEY.md
round-3/4 addenda). A hung child is killed and reported as a `fail` with
the elapsed budget, which turns the worst failure mode (silent multi-hour
hang at job start) into a 2-minute diagnosis. All other checks are pure
host-side and never touch a backend, so the doctor itself can always run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from typing import List, Tuple

Check = Tuple[str, str, str]  # (status, name, detail); status ok|warn|fail

# Child probe source. Mirrors cli.common.apply_platform_override: the env
# var alone does not stick on this platform (sitecustomize registers the
# TPU plugin and overrides it at startup), so the override is applied via
# jax.config BEFORE any backend is touched. The jitted reduction forces a
# real compile + execute + D2H readback — `jax.devices()` alone can
# succeed against a relay that then stalls on execution.
_PROBE_SRC = """
import json, os, time
t0 = time.time()
import jax
plat = os.environ.get("MULTIBOX_JAX_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
import jax.numpy as jnp
y = float(jax.jit(lambda v: (v * 2 + 1).sum())(jnp.arange(8.0)))
d = jax.devices()[0]
print(json.dumps({
    "value": y,
    "platform": d.platform,
    "device_kind": getattr(d, "device_kind", "?"),
    "n_devices": jax.device_count(),
    "elapsed_s": round(time.time() - t0, 2),
}))
"""


def check_python_deps() -> Check:
    vers = []
    try:
        for name in ("jax", "flax", "optax", "orbax.checkpoint", "numpy"):
            mod = __import__(name)
            # orbax.checkpoint: version lives on the submodule
            for part in name.split(".")[1:]:
                mod = getattr(mod, part)
            vers.append(f"{name} {getattr(mod, '__version__', '?')}")
    except ImportError as e:
        return ("fail", "python-deps", f"import failed: {e}")
    return ("ok", "python-deps", ", ".join(vers))


def check_native_layer() -> Check:
    try:
        from multibox_tpu.data import _native

        if not _native.available():
            return ("warn", "native-layer",
                    "libmultibox_native.so not built — tfrecord reads fall "
                    "back to the pure-python path (~186x slower); build with "
                    "`make -C multibox_tpu/native`")
        return ("ok", "native-layer", "libmultibox_native.so loaded")
    except Exception as e:  # never let a probe kill the doctor
        return ("warn", "native-layer", f"probe failed: {e}")


def check_xla_cache() -> Check:
    cache_dir = os.environ.get(
        "MULTIBOX_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "multibox_tpu_xla"),
    )
    if not os.path.isdir(cache_dir):
        return ("warn", "xla-cache",
                f"{cache_dir} does not exist yet — first CLI run creates it; "
                "fresh compiles are remote RPCs without it")
    if not os.access(cache_dir, os.W_OK):
        return ("fail", "xla-cache", f"{cache_dir} not writable")
    entries = [e for e in os.listdir(cache_dir)
               if os.path.isfile(os.path.join(cache_dir, e))]
    mb = sum(os.path.getsize(os.path.join(cache_dir, e))
             for e in entries) / 1e6
    return ("ok", "xla-cache",
            f"{cache_dir}: {len(entries)} entries, {mb:.0f} MB")


def check_platform_config() -> Check:
    override = os.environ.get("MULTIBOX_JAX_PLATFORM")
    env = os.environ.get("JAX_PLATFORMS")
    parts = [f"MULTIBOX_JAX_PLATFORM={override or '(unset)'}",
             f"JAX_PLATFORMS={env or '(unset)'}"]
    if env and not override:
        # The exact trap CLAUDE.md documents: sitecustomize overrides the
        # env var at startup, so the var alone does not take effect.
        return ("warn", "platform-config",
                "; ".join(parts) + " — JAX_PLATFORMS alone may not stick if "
                "a sitecustomize registers plugins; use MULTIBOX_JAX_PLATFORM "
                "for CLI subprocesses")
    return ("ok", "platform-config", "; ".join(parts))


def check_tfrecord_roundtrip() -> Check:
    """Serialize one Example through the wire codec and parse it back.

    Pure host-side; catches a broken install (missing package data, numpy
    ABI mismatch) before a training job wastes a device allocation.
    """
    import tempfile

    import numpy as np

    try:
        from multibox_tpu.data.example_proto import (
            build_detection_example, parse_detection_example)
        from multibox_tpu.data.tfrecord import TFRecordWriter, read_records

        boxes = np.array([[0.1, 0.2, 0.6, 0.8]], np.float32)
        ex = build_detection_example(
            image_bytes=b"\xff\xd8fakejpeg", image_id="doctor", boxes=boxes,
            labels=np.array([1], np.int64), height=4, width=4)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "doctor.tfrecord")
            with TFRecordWriter(path) as w:
                w.write(ex)
            recs = list(read_records([path]))
        parsed = parse_detection_example(recs[0])
        if parsed["image_id"] != "doctor" or len(parsed["boxes"]) != 1:
            return ("fail", "tfrecord-roundtrip", "parsed fields mismatch")
        return ("ok", "tfrecord-roundtrip", "write → read → parse agrees")
    except Exception as e:
        return ("fail", "tfrecord-roundtrip", f"{type(e).__name__}: {e}")


def check_device(timeout_s: float) -> Check:
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return ("fail", "device",
                f"probe hung past {timeout_s:.0f}s and was killed — backend "
                "unreachable (on the axon platform this is the relay-outage "
                "signature: jax.devices() hangs rather than raising)")
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        return ("fail", "device",
                f"probe exited {proc.returncode}: {tail[-1] if tail else '?'}")
    try:
        info = json.loads(proc.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return ("fail", "device", f"unparseable probe output: {proc.stdout!r}")
    if info["value"] != 64.0:  # sum(2v+1, v=0..7)
        return ("fail", "device", f"wrong arithmetic result: {info['value']}")
    detail = (f"{info['n_devices']}x {info['device_kind']} "
              f"({info['platform']}), compile+execute+readback "
              f"{info['elapsed_s']}s (wall {time.time() - t0:.1f}s)")
    status = "ok"
    if info["elapsed_s"] > 60:
        status, detail = "warn", detail + " — slow; relay under load?"
    return (status, "device", detail)


def run_checks(device_timeout_s: float, skip_device: bool) -> List[Check]:
    checks = [
        check_python_deps(),
        check_platform_config(),
        check_xla_cache(),
        check_native_layer(),
        check_tfrecord_roundtrip(),
    ]
    if not skip_device:
        checks.append(check_device(device_timeout_s))
    return checks


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--device_timeout", type=float, default=120.0,
                        help="hard budget (s) for the subprocess device "
                             "probe before declaring the backend unreachable")
    parser.add_argument("--skip_device", action="store_true",
                        help="host-side checks only (never spawns a probe)")
    parser.add_argument("--json", action="store_true", dest="as_json",
                        help="one JSON object instead of per-check lines")
    args = parser.parse_args(argv)

    checks = run_checks(args.device_timeout, args.skip_device)
    ok = all(status != "fail" for status, _, _ in checks)
    if args.as_json:
        print(json.dumps({
            "ok": ok,
            "checks": [{"status": s, "name": n, "detail": d}
                       for s, n, d in checks],
        }))
    else:
        for status, name, detail in checks:
            print(f"[{status}] {name}: {detail}")
        print("doctor: all checks passed" if ok
              else "doctor: FAILURES above", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
