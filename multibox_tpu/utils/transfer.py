"""Fast host→device pytree transfer for high-latency links.

``jax.device_put`` on a pytree issues one transfer per leaf; on a
high-latency device link (the `axon` TPU tunnel here: ~0.3–0.5s per
transfer regardless of size) a 750-leaf train state costs minutes. This
utility packs all leaves into a few large host buffers (grouped by dtype,
chunked to stay under the link's large-transfer limits), transfers those,
and splits them back into the original tree in ONE jitted on-device
program (compiled once, persistent-cached).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK_BYTES = 32 << 20  # 32 MB — large transfers (>~64MB) stall the tunnel


def fast_device_put(tree: Any, device: Optional[Any] = None) -> Any:
    """Equivalent of ``jax.device_put(tree, device)`` in O(few) transfers."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    if device is None:
        device = jax.devices()[0]

    host_leaves = [np.asarray(l) for l in leaves]
    groups: dict = {}  # dtype -> list of leaf indices
    for i, l in enumerate(host_leaves):
        groups.setdefault(l.dtype.str, []).append(i)

    group_items = sorted(groups.items())
    chunks_per_group = []
    device_chunks = []
    for dtype_str, idxs in group_items:
        dt = np.dtype(dtype_str)
        flat = (
            np.concatenate([host_leaves[i].ravel() for i in idxs])
            if idxs
            else np.zeros((0,), dt)
        )
        step = max(_CHUNK_BYTES // max(dt.itemsize, 1), 1)
        bounds = list(range(0, max(flat.size, 1), step))
        chunks = [flat[o : o + step] for o in bounds]
        chunks_per_group.append(len(chunks))
        device_chunks.extend(jax.device_put(c, device) for c in chunks)

    # Static unpack spec: (group sizes, per-leaf (group, offset, shape, dtype)).
    specs = []
    offsets = {g: 0 for g, _ in group_items}
    group_index = {g: gi for gi, (g, _) in enumerate(group_items)}
    leaf_specs: list = [None] * len(leaves)
    for dtype_str, idxs in group_items:
        for i in idxs:
            l = host_leaves[i]
            leaf_specs[i] = (
                group_index[dtype_str],
                offsets[dtype_str],
                l.shape,
                l.dtype.str,
            )
            offsets[dtype_str] += l.size
    specs = tuple(leaf_specs)
    chunks_key = tuple(chunks_per_group)

    unpacked = _unpack(specs, chunks_key, *device_chunks)
    return jax.tree.unflatten(treedef, list(unpacked))


@functools.lru_cache(maxsize=64)
def _build_unpack(specs, chunks_per_group):
    def unpack(*chunks):
        # Reassemble per-group flat buffers.
        buffers = []
        pos = 0
        for n in chunks_per_group:
            parts = chunks[pos : pos + n]
            pos += n
            buffers.append(
                parts[0] if n == 1 else jnp.concatenate(list(parts))
            )
        out = []
        for gi, off, shape, dtype_str in specs:
            size = 1
            for s in shape:
                size *= s
            leaf = jax.lax.dynamic_slice(buffers[gi], (off,), (size,))
            out.append(leaf.reshape(shape))
        return tuple(out)

    return jax.jit(unpack)


def _unpack(specs, chunks_key, *device_chunks):
    return _build_unpack(specs, chunks_key)(*device_chunks)
