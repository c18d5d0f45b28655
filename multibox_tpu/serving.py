"""Serving: load an exported detector and run inference.

The consumer side of ``multibox-export`` (ref:export.py produced a frozen
GraphDef consumed by downstream apps; SURVEY.md §2 C13). An export
directory contains ``detect.stablehlo.bin`` (serialized ``jax.export``
artifact with EMA weights baked in), optional ``detect_b{N}.stablehlo.bin``
siblings for additional batch sizes (``multibox-export --batch_sizes``),
``priors.pkl`` and ``config.pkl``.

``load_exported`` returns a ready detector: a callable
``detect(images) -> {boxes, scores, classes, num}`` plus its config and
priors — no flax/model code needed at serving time, just jax.
"""

from __future__ import annotations

import glob
import os
import pickle
from dataclasses import dataclass, field
from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class ExportedDetector:
    detect: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]]
    config: object
    priors: np.ndarray
    batch_size: int
    input_size: int
    # batch size -> compiled program; single-program exports have one entry.
    calls: Dict[int, Callable] = field(default_factory=dict)

    def warmup(self) -> None:
        """Execute every exported batch-size program once (zero inputs).

        Exported programs compile lazily on first call; on a high-latency
        device link a fresh compile costs seconds to minutes. Without
        warmup, the first request group that happens to fill a given batch
        size stalls behind that compile — under concurrency this turns
        into a timeout storm the moment load first spikes (measured: the
        serve bench's first batch-32 group blew through the 60 s waiter
        timeout). Serving daemons call this once at startup so steady-state
        latency is the only latency."""
        for size in sorted(self.calls):
            dummy = jnp.zeros(
                (size, self.input_size, self.input_size, 3), jnp.float32
            )
            out = self.calls[size](dummy)
            # Force a REAL device round-trip: block_until_ready does NOT
            # sync through the axon relay (CLAUDE.md hard-won finding) —
            # it returned while the first execution was still in flight,
            # so `ready` fired early and the first request group still ate
            # the compile stall (measured round 5: first-arm 503 cascades
            # in every fresh serve process). An explicit D2H of every
            # output leaf is the only sync that holds on this link.
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)

    def __call__(self, images) -> Dict[str, np.ndarray]:
        """Run detection on ``[B, S, S, 3]`` float32 images in [-1, 1].

        Exported programs have STATIC batch shapes; requests dispatch to
        the best-fitting exported size — greedily the largest program ≤
        the remainder, falling back to the smallest program (padded) for
        the tail — so a multi-size export pads at most ``min(sizes)-1``
        rows per request instead of rounding everything up.
        """
        images = np.asarray(images, np.float32)
        B = images.shape[0]
        sizes = sorted(self.calls) or [self.batch_size]
        if B == 0:
            # Empty batch: derive output shapes/dtypes WITHOUT executing —
            # a real probe call would pay a fresh compile + execute on a
            # high-latency device link just to return nothing.
            spec = jax.eval_shape(
                self.calls.get(sizes[0], self.detect),
                jax.ShapeDtypeStruct(
                    (sizes[0], self.input_size, self.input_size, 3),
                    jnp.float32,
                ),
            )
            return {
                k: np.zeros((0,) + tuple(v.shape[1:]), v.dtype)
                for k, v in spec.items()
            }
        out_parts = []
        start = 0
        while start < B:
            rem = B - start
            fitting = [s for s in sizes if s <= rem]
            size = max(fitting) if fitting else sizes[0]
            n = min(size, rem)
            chunk = images[start : start + n]
            if n < size:
                pad = np.zeros((size - n,) + chunk.shape[1:], np.float32)
                chunk = np.concatenate([chunk, pad])
            call = self.calls.get(size, self.detect)
            res = call(jnp.asarray(chunk))
            out_parts.append({k: np.asarray(v)[:n] for k, v in res.items()})
            start += n
        return {
            k: np.concatenate([p[k] for p in out_parts]) for k in out_parts[0]
        }


def load_exported(export_dir: str) -> ExportedDetector:
    """Load a ``multibox-export`` directory into a callable detector.

    Reads the primary ``detect.stablehlo.bin`` plus any
    ``detect_b{N}.stablehlo.bin`` siblings (``--batch_sizes`` exports) and
    dispatches per request batch size."""
    from jax import export as jax_export

    paths = [os.path.join(export_dir, "detect.stablehlo.bin")]
    paths += sorted(glob.glob(os.path.join(export_dir, "detect_b*.stablehlo.bin")))
    calls: Dict[int, Callable] = {}
    input_size = None
    for path in paths:
        with open(path, "rb") as f:
            exported = jax_export.deserialize(f.read())
        (spec,) = exported.in_avals
        # Primary first + setdefault: on a batch-size collision the primary
        # wins (a stale sibling left by an older exporter must not shadow
        # the fresh program; multibox-export now also deletes stale ones).
        calls.setdefault(int(spec.shape[0]), jax.jit(exported.call))
        if input_size is None:
            input_size = int(spec.shape[1])

    with open(os.path.join(export_dir, "config.pkl"), "rb") as f:
        config = pickle.load(f)
    with open(os.path.join(export_dir, "priors.pkl"), "rb") as f:
        priors = pickle.load(f)

    largest = max(calls)
    return ExportedDetector(
        detect=calls[largest],
        config=config,
        priors=np.asarray(priors),
        batch_size=largest,
        input_size=input_size,
        calls=calls,
    )
