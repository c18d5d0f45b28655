"""Cross-process gather of host-side Python objects.

The reference is single-process (SURVEY.md §2.3), so multi-HOST
detect/eval is rebuild-side scope: input records are sharded per process
(``data.pipeline.DetectionDataset`` shard_index/shard_count), each host
runs detection on its own local devices (detection is embarrassingly
parallel over the batch — a global mesh would buy nothing and its outputs
would span non-addressable devices), and the per-host result lists merge
with ONE logical all-gather over the distributed runtime.

Arbitrary picklable objects ride a padded uint8 tensor through
``jax.experimental.multihost_utils.process_allgather`` — two collectives
total (lengths, payload), independent of how many results each host holds.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np


def process_allgather_objects(obj: Any) -> List[Any]:
    """All-gather one picklable object per process.

    Returns ``[obj_from_process_0, ..., obj_from_process_{P-1}]`` —
    identical on every host (allgather semantics). Single-process: a
    passthrough ``[obj]`` with no collective, so callers need no
    process-count branches.

    Failure mode (operator note, see docs/PRODUCTION.md): if one peer dies
    BEFORE reaching this collective (e.g. a corrupt record raised in its
    detect loop), the surviving hosts block inside ``process_allgather``
    until the distributed-runtime barrier timeout with no local symptom —
    a long eval that "hangs" near the end usually means one worker
    crashed; check the failed worker's log first.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    from multibox_tpu.parallel.sync import coordination_barrier

    # Hosts arrive here with unbounded skew (per-host shards of differing
    # cost, compile-time jitter) and Gloo's rendezvous only tolerates 30 s
    # of it (see parallel.sync). Align through the coordination service
    # first so the Gloo collectives below start together.
    coordination_barrier("allgather_objects")
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    if payload.size >= 2**31:
        raise ValueError(
            f"object pickles to {payload.size} bytes — too large for one "
            "cross-host gather; shard the results (e.g. raise the detect "
            "score threshold or gather in batches)"
        )
    lens = np.asarray(
        multihost_utils.process_allgather(
            jnp.asarray([payload.size], jnp.int32)
        )
    ).reshape(-1)
    padded = np.zeros((int(lens.max()),), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(padded))
    ).reshape(lens.size, -1)
    return [
        pickle.loads(gathered[i, : lens[i]].tobytes())
        for i in range(lens.size)
    ]
