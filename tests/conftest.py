"""Test configuration: run the suite on a fake 8-device CPU mesh.

Multi-chip hardware is unavailable (one real TPU behind the experimental
`axon` platform); sharding and collective correctness is validated on XLA's
host-platform fake devices (SURVEY.md §4 "Distributed without a cluster").

Note: the container's sitecustomize imports jax at interpreter startup with
``JAX_PLATFORMS=axon`` already in the env, so env vars set here are too
late — we must force the platform through ``jax.config``. ``XLA_FLAGS`` is
still honored because the CPU backend initializes lazily on first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiles (the
# 1-core host compiles large CPU programs in minutes).
from multibox_tpu.cli.common import setup_jax_cache  # noqa: E402

setup_jax_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_boxes(rng, n, min_size=0.02, max_size=0.6):
    """Random valid normalized corner boxes [n, 4]."""
    cy = rng.uniform(0.1, 0.9, size=n)
    cx = rng.uniform(0.1, 0.9, size=n)
    h = rng.uniform(min_size, max_size, size=n)
    w = rng.uniform(min_size, max_size, size=n)
    boxes = np.stack(
        [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1
    ).astype(np.float32)
    return np.clip(boxes, 0.0, 1.0)


@pytest.fixture
def make_boxes():
    return random_boxes
