"""Cross-process alignment through the COORDINATION SERVICE, not Gloo.

Multi-host scope is rebuild-side (the reference is single-process —
SURVEY.md §2.3; BASELINE.json configs[4]). On CPU backends jax executes
cross-host collectives over Gloo, and Gloo's rendezvous hard-codes a 30 s
key-value deadline (``GetKeyValue() timed out`` — not reachable from any
env var or ``jax.distributed.initialize`` argument in jax 0.9). Any
host-side phase with unbounded inter-process skew — imports, fresh
compiles on a contended host, per-host input shards of different cost —
that is followed by a collective can therefore kill the job even though
nothing is wrong.

``coordination_barrier`` aligns processes through the distributed
runtime's coordination service instead (one gRPC to the coordinator per
process, configurable timeout, no Gloo context). Fencing rule: put a
barrier BETWEEN the skewing phase and the next collective, so every
process enters the collective's rendezvous within RPC-latency of the
others. The train loop additionally AOT-compiles its step program before
the fence (``train.loop``), because a jit-on-first-call compile would put
the skew back INSIDE the fenced region.
"""

from __future__ import annotations

import itertools
import os

import jax

# Generous default: fresh compiles on a contended 1-core host take minutes.
# Overridable for even slower environments without touching call sites.
_DEFAULT_TIMEOUT_S = float(os.environ.get("MULTIBOX_BARRIER_TIMEOUT_S", 600))

# The coordination service rejects re-use of an in-flight barrier id; a
# process-local counter keeps ids unique. Every process must execute the
# SAME barrier sequence (they do: barriers sit on process-invariant code
# paths), so counters agree across hosts.
_counter = itertools.count()


def coordination_barrier(name: str, timeout_s: float = None) -> None:
    """Block until every process reaches this barrier (or raise on
    timeout). No-op when single-process or when jax.distributed was never
    initialized, so call sites need no process-count branches."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # multi-process topology without a coordinator
        return
    timeout_s = _DEFAULT_TIMEOUT_S if timeout_s is None else timeout_s
    client.wait_at_barrier(
        f"multibox:{name}:{next(_counter)}", int(timeout_s * 1000)
    )
