"""Prior-box generation.

Two generators, mirroring the reference's capabilities plus the SSD-style
multi-scale extension (BASELINE.json configs[3]):

* :func:`generate_priors_kmeans` — cluster the normalized ground-truth
  boxes of a dataset into ``P`` priors (the approach of ref:priors.py per
  SURVEY.md §2 C2, following arXiv:1412.1441 §2: priors are chosen so every
  gt has a nearby prior). Implemented as seeded k-means in jnp (k-means++
  init, fixed iteration count → deterministic, jit-able).
* :func:`generate_priors_multiscale` — SSD-style grid priors: for each
  feature-map resolution, a regular grid of centers × (scale, aspect-ratio)
  shapes (Liu et al., arXiv:1512.02325 §2.2).

Priors are ``[P, 4]`` float32 normalized corner boxes, saved/loaded as
pickles for CLI parity with the reference (``--priors`` flag).
"""

from __future__ import annotations

import math
import pickle
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def generate_priors_kmeans(
    gt_boxes: np.ndarray,
    num_priors: int,
    num_iters: int = 50,
    seed: int = 0,
) -> np.ndarray:
    """K-means clustering of gt boxes in (ymin, xmin, ymax, xmax) space.

    Args:
      gt_boxes: ``[N, 4]`` normalized corner boxes from the training set.
      num_priors: number of clusters P.
      num_iters: fixed Lloyd iterations (deterministic).
      seed: PRNG seed for k-means++ initialization.

    Returns:
      ``[P, 4]`` float32 priors, rows sorted lexicographically for
      determinism independent of cluster-index order.
    """
    boxes = jnp.asarray(gt_boxes, dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)
    centers = _kmeans_pp_init(key, boxes, num_priors)
    centers = _lloyd(boxes, centers, num_iters)
    out = np.asarray(centers)
    order = np.lexsort((out[:, 3], out[:, 2], out[:, 1], out[:, 0]))
    return out[order]


def _kmeans_pp_init(key, points: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding with jax.random (D² sampling), lax.scan over k."""
    n = points.shape[0]
    key, sub = jax.random.split(key)
    first = points[jax.random.randint(sub, (), 0, n)]

    def step(carry, sub):
        centers, count, d2 = carry
        # Sample next center ∝ squared distance to the nearest chosen center.
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        nxt = points[idx]
        centers = centers.at[count].set(nxt)
        nd2 = jnp.sum((points - nxt[None, :]) ** 2, axis=-1)
        return (centers, count + 1, jnp.minimum(d2, nd2)), None

    centers = jnp.zeros((k, 4), dtype=points.dtype).at[0].set(first)
    d2 = jnp.sum((points - first[None, :]) ** 2, axis=-1)
    subs = jax.random.split(key, k - 1) if k > 1 else jnp.zeros((0, 2), jnp.uint32)
    (centers, _, _), _ = jax.lax.scan(step, (centers, 1, d2), subs)
    return centers


def _lloyd(points: jnp.ndarray, centers: jnp.ndarray, num_iters: int) -> jnp.ndarray:
    """Fixed-iteration Lloyd updates; empty clusters keep their center."""

    def step(centers, _):
        d2 = jnp.sum(
            (points[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        )  # [N, K]
        assign = jnp.argmin(d2, axis=1)  # [N]
        k = centers.shape[0]
        one_hot = jax.nn.one_hot(assign, k, dtype=points.dtype)  # [N, K]
        counts = jnp.sum(one_hot, axis=0)  # [K]
        sums = one_hot.T @ points  # [K, 4]
        new = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=num_iters)
    return centers


def generate_priors_multiscale(
    feature_map_sizes: Sequence[int],
    scales: Sequence[float] | None = None,
    aspect_ratios: Sequence[float] = (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
    s_min: float = 0.2,
    s_max: float = 0.9,
    add_interp_scale: bool = True,
    clip: bool = True,
) -> np.ndarray:
    """SSD-style multi-resolution grid priors (arXiv:1512.02325 §2.2).

    For feature map m of size f×f, centers are ((i+.5)/f, (j+.5)/f); shapes
    are (s_m·√ar, s_m/√ar) per aspect ratio, plus the √(s_m·s_{m+1})
    square prior when ``add_interp_scale``.

    Returns ``[P, 4]`` float32 normalized corner boxes.
    """
    m = len(feature_map_sizes)
    if scales is None:
        if m == 1:
            scales = [s_min]
        else:
            scales = [s_min + (s_max - s_min) * k / (m - 1) for k in range(m)]
    scales = list(scales) + [1.0]  # s_{m+1} for the interpolated scale

    priors = []
    for level, f in enumerate(feature_map_sizes):
        s = scales[level]
        shapes = [(s * math.sqrt(ar), s / math.sqrt(ar)) for ar in aspect_ratios]
        if add_interp_scale:
            s_prime = math.sqrt(s * scales[level + 1])
            shapes.append((s_prime, s_prime))
        for i in range(f):
            for j in range(f):
                cy = (i + 0.5) / f
                cx = (j + 0.5) / f
                for h, w in shapes:
                    priors.append((cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2))
    out = np.asarray(priors, dtype=np.float32)
    if clip:
        out = np.clip(out, 0.0, 1.0)
    return out


def save_priors(priors: np.ndarray, path: str) -> None:
    """Pickle priors — format-compatible with the reference's --priors flag."""
    with open(path, "wb") as f:
        pickle.dump(np.asarray(priors, dtype=np.float32), f)


def load_priors(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        priors = pickle.load(f)
    try:
        priors = np.asarray(priors, dtype=np.float32)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"{path}: not a priors pickle (expected a [P, 4] float array, "
            f"got {type(priors).__name__})"
        ) from e
    if priors.ndim != 2 or priors.shape[1] != 4:
        raise ValueError(f"priors must be [P, 4], got {priors.shape}")
    return priors
