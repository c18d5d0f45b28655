"""Serving: load an exported detector and run inference.

The consumer side of ``multibox-export`` (ref:export.py produced a frozen
GraphDef consumed by downstream apps; SURVEY.md §2 C13). An export
directory contains ``detect.stablehlo.bin`` (serialized ``jax.export``
artifact with EMA weights baked in), ``priors.pkl`` and ``config.pkl``.

``load_exported`` returns a ready detector: a callable
``detect(images) -> {boxes, scores, classes, num}`` plus its config and
priors — no flax/model code needed at serving time, just jax.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
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

    def __call__(self, images) -> Dict[str, np.ndarray]:
        """Run detection on ``[B, S, S, 3]`` float32 images in [-1, 1];
        pads/splits to the exported batch size automatically."""
        images = np.asarray(images, np.float32)
        B = images.shape[0]
        if B == 0:
            # Empty batch: derive output shapes/dtypes WITHOUT executing —
            # a real probe call would pay a fresh compile + execute on a
            # high-latency device link just to return nothing.
            spec = jax.eval_shape(
                self.detect,
                jax.ShapeDtypeStruct(
                    (self.batch_size, self.input_size, self.input_size, 3),
                    jnp.float32,
                ),
            )
            return {
                k: np.zeros((0,) + tuple(v.shape[1:]), v.dtype)
                for k, v in spec.items()
            }
        out_parts = []
        for start in range(0, B, self.batch_size):
            chunk = images[start : start + self.batch_size]
            n = chunk.shape[0]
            if n < self.batch_size:
                pad = np.zeros(
                    (self.batch_size - n,) + chunk.shape[1:], np.float32
                )
                chunk = np.concatenate([chunk, pad])
            res = self.detect(jnp.asarray(chunk))
            out_parts.append({k: np.asarray(v)[:n] for k, v in res.items()})
        return {
            k: np.concatenate([p[k] for p in out_parts]) for k in out_parts[0]
        }


def load_exported(export_dir: str) -> ExportedDetector:
    """Load a ``multibox-export`` directory into a callable detector."""
    from jax import export as jax_export

    with open(os.path.join(export_dir, "detect.stablehlo.bin"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(export_dir, "config.pkl"), "rb") as f:
        config = pickle.load(f)
    with open(os.path.join(export_dir, "priors.pkl"), "rb") as f:
        priors = pickle.load(f)

    (spec,) = exported.in_avals
    batch_size, input_size = int(spec.shape[0]), int(spec.shape[1])
    call = jax.jit(exported.call)

    def detect(images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return call(images)

    return ExportedDetector(
        detect=detect,
        config=config,
        priors=np.asarray(priors),
        batch_size=batch_size,
        input_size=input_size,
    )
