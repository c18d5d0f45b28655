"""Shared CLI plumbing: flag surface compatible with the reference."""

from __future__ import annotations

import argparse
import glob
import logging
import os
from typing import List

from multibox_tpu.config import Config, parse_config_file


def setup_logging(verbose: bool = True) -> None:
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    apply_platform_override()
    setup_jax_cache()


def apply_platform_override() -> None:
    """Honor ``MULTIBOX_JAX_PLATFORM`` (e.g. ``cpu``) in every CLI process.

    The ``JAX_PLATFORMS`` env var alone is NOT reliable here: this
    container's sitecustomize registers the axon TPU plugin at interpreter
    startup and programmatically sets ``jax_platforms=axon,cpu``, which
    overrides the env var — a fresh subprocess then initializes the axon
    backend (and hangs if the relay is unreachable) even with
    ``JAX_PLATFORMS=cpu`` exported. A late ``jax.config.update`` is the
    only override that sticks, so CLI entry points apply one before any
    backend is touched. Needed by anything that spawns CLI subprocesses
    off-TPU (tests, the ``--restart_every_steps`` supervisor's children
    under test)."""
    plat = os.environ.get("MULTIBOX_JAX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    _relax_cpu_collective_deadline(plat)


def _relax_cpu_collective_deadline(plat) -> None:
    """Raise XLA:CPU's hard collective-rendezvous deadline on forced-CPU
    runs (``MULTIBOX_JAX_PLATFORM=cpu`` or an
    ``xla_force_host_platform_device_count`` mesh).

    XLA:CPU aborts the whole process 40 s after the first participant of a
    cross-module collective arrives ("Termination timeout ... exceeded.
    Exiting to ensure a consistent program state"). On an oversubscribed
    host the N virtual devices of a fake mesh execute nearly serially, so
    any SPMD program whose per-device compute runs tens of seconds — e.g.
    configs/coco_dp.yaml's b256 Inception step on this container's 1-core
    host (measured twice, round 5) — legitimately staggers its all-gather
    arrivals past 40 s and gets killed mid-step. The deadline exists to
    catch deadlocks, not slow hosts; bound runaway demos with an outer
    ``timeout`` instead. User-provided values in ``XLA_FLAGS`` win;
    ``MULTIBOX_CPU_COLLECTIVE_TIMEOUT_S`` tunes the default (1800 s).

    Must run before the first compilation: XLA parses ``XLA_FLAGS`` once,
    lazily, at the first DebugOptions access (CLI mains call this before
    any backend use)."""
    xla_flags = os.environ.get("XLA_FLAGS", "")
    cpu_forced = (
        plat == "cpu"
        or "xla_force_host_platform_device_count" in xla_flags
    )
    if not cpu_forced or "xla_cpu_collective_call" in xla_flags:
        return
    timeout_s = int(os.environ.get("MULTIBOX_CPU_COLLECTIVE_TIMEOUT_S", "1800"))
    # (the matching warn_stuck flag exists in DebugOptions but is NOT
    # registered with this jaxlib's XLA_FLAGS parser — passing it aborts
    # the process with "Unknown flag"; the 20 s stuck-warning log lines
    # are harmless, only the terminate deadline matters)
    os.environ["XLA_FLAGS"] = (
        xla_flags
        + f" --xla_cpu_collective_call_terminate_timeout_seconds={timeout_s}"
    ).strip()


def setup_jax_cache() -> None:
    """Persistent XLA compilation cache: each CLI is a fresh process, and on
    the `axon` platform every compile is a remote RPC (seconds to minutes) —
    caching across processes removes that cost for repeated invocations."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "MULTIBOX_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "multibox_tpu_xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never fatal
        logging.getLogger(__name__).debug("compilation cache unavailable")


def expand_tfrecords(patterns: List[str]) -> List[str]:
    paths: List[str] = []
    for p in patterns:
        matched = sorted(glob.glob(p))
        paths.extend(matched if matched else [p])
    if not paths:
        raise SystemExit("no tfrecord files matched")
    return paths


def add_config_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--config", type=str, default=None,
        help="YAML config (reference UPPER_CASE keys accepted)",
    )


def load_config(args: argparse.Namespace) -> Config:
    return parse_config_file(args.config) if args.config else Config()
