"""Device mesh + sharding for data-parallel training over ICI.

The reference is single-process/single-device (SURVEY.md §2.3); scaling is
a rebuild-side requirement (BASELINE.json configs[4]: "Data-parallel COCO
training on a v4-8 mesh ... all-reduce over ICI").

Design: a 1-axis ``data`` mesh. The train state is replicated; each batch
is sharded on its leading axis. The train step itself is the plain
single-device function from ``train.state`` — jit with these shardings and
XLA inserts the gradient all-reduce (psum) over ICI automatically. No
hand-written collectives, no per-device code: the idiomatic
jax.sharding/pjit formulation of what torch/TF frameworks do with
NCCL/Horovod wrappers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_host_local(x, sharding: NamedSharding, batch_dim: int = 0):
    """Device-put one host array under ``sharding``, treating it as this
    PROCESS'S slice of the batch axis on multi-host meshes.

    Single process: a plain ``device_put`` (the array IS the global
    batch). Multi-host: each process holds ``global/process_count`` rows
    (the input pipeline shards records per process and sizes its local
    batch accordingly — ``train.loop``), and
    ``jax.make_array_from_process_local_data`` assembles the global
    sharded array without any cross-host transfer of the data itself.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    gshape = list(x.shape)
    gshape[batch_dim] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x), tuple(gshape)
    )


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch with its leading axis sharded over the mesh
    (process-local slice on multi-host meshes — see put_host_local)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: put_host_local(x, sharding), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate the train state across the mesh.

    Multi-host: leaves that are already COMMITTED process-local jax arrays
    (e.g. an orbax restore into a single-device template) cannot be
    ``device_put`` onto a mesh spanning other processes — jax raises
    "backend does not support cross-host device transfers". Every process
    holds the identical full value (same checkpoint, same init seed), so
    pull such leaves back to host first; the put is then a purely local
    placement onto each process's addressable replicas.
    """
    if jax.process_count() > 1:
        state = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            state,
        )
    return jax.device_put(state, replicated(mesh))


def make_parallel_detect_fn(detect_fn, mesh: Mesh, axis: str = "data"):
    """Shard batched detection over the mesh: variables replicated, images
    and all detection outputs sharded on the batch axis (BASELINE
    configs[1] "batched detection ... vectorized NMS" at multi-chip scale)."""
    state_s = replicated(mesh)
    batch_s = batch_sharding(mesh, axis)
    return jax.jit(
        detect_fn, in_shardings=(state_s, batch_s), out_shardings=batch_s
    )


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """jit the single-device train step over the mesh.

    State: replicated. Batch: sharded on the leading (batch) axis. Output
    state/metrics: replicated. With these in/out shardings XLA compiles the
    backward pass with a gradient all-reduce over ICI — the psum is derived,
    not hand-written.
    """
    state_s = replicated(mesh)
    batch_s = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(state_s, batch_s),
        out_shardings=(state_s, state_s),
        donate_argnums=(0,),
    )
