"""Parallelism: device mesh + shardings for data-parallel training."""

from multibox_tpu.parallel.gather import process_allgather_objects
from multibox_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    make_parallel_detect_fn,
    make_parallel_train_step,
    replicate_state,
)
from multibox_tpu.parallel.sync import coordination_barrier

__all__ = [
    "coordination_barrier",
    "make_mesh",
    "shard_batch",
    "make_parallel_detect_fn",
    "make_parallel_train_step",
    "process_allgather_objects",
    "replicate_state",
]
