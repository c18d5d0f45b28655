"""Box geometry in normalized corner coordinates ``[ymin, xmin, ymax, xmax]``.

All coordinates live in ``[0, 1]`` relative to image height/width — the
TensorFlow detection convention used by the reference stack
(ref:inputs.py / ref:priors.py per SURVEY.md §2 C2/C3). Everything here is
pure ``jnp``: jit-able, vmap-able, differentiable, static shapes.

Two encodings are provided:

* **MultiBox residual** (``encode_boxes`` / ``decode_boxes``): the original
  DeepMultiBox parameterization, ``offset = gt − prior`` directly in
  normalized corner coordinates (Erhan et al., CVPR'14, arXiv:1312.2249;
  ref:detect.py decode step per SURVEY.md §2 C9). This is the
  parity-critical default.
* **SSD center/log-scale** (``encode_boxes_ssd`` / ``decode_boxes_ssd``):
  the (cy, cx, h, w) faster-RCNN/SSD encoding with variances (Liu et al.,
  arXiv:1512.02325 §2.2), used by the SSD-style multi-scale extension
  (BASELINE.json configs[3]).
"""

from __future__ import annotations

import jax.numpy as jnp

# Numerical floor for degenerate-box divisions / logs.
EPS = 1e-8


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas. ``boxes``: ``[..., 4]`` → ``[...]``. Degenerate boxes → 0."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = jnp.maximum(ymax - ymin, 0.0)
    w = jnp.maximum(xmax - xmin, 0.0)
    return (h * w).squeeze(-1)


def intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas. ``a``: ``[N, 4]``, ``b``: ``[M, 4]`` → ``[N, M]``."""
    ay0, ax0, ay1, ax1 = jnp.split(a, 4, axis=-1)  # each [N, 1]
    by0, bx0, by1, bx1 = jnp.split(b, 4, axis=-1)  # each [M, 1]
    inter_h = jnp.minimum(ay1, by1.T) - jnp.maximum(ay0, by0.T)
    inter_w = jnp.minimum(ax1, bx1.T) - jnp.maximum(ax0, bx0.T)
    return jnp.maximum(inter_h, 0.0) * jnp.maximum(inter_w, 0.0)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. ``a``: ``[N, 4]``, ``b``: ``[M, 4]`` → ``[N, M]`` in [0, 1].

    IoU with a degenerate (zero-area) box is 0, not NaN — padded gt rows
    (all-zero boxes) must stay inert through matching.
    """
    inter = intersection(a, b)
    union = area(a)[:, None] + area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


def iou_pairwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (aligned) IoU. ``a``, ``b``: ``[..., 4]`` → ``[...]``."""
    ay0, ax0, ay1, ax1 = jnp.split(a, 4, axis=-1)
    by0, bx0, by1, bx1 = jnp.split(b, 4, axis=-1)
    inter_h = jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0)
    inter_w = jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0)
    inter = (jnp.maximum(inter_h, 0.0) * jnp.maximum(inter_w, 0.0)).squeeze(-1)
    union = area(a) + area(b) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


def clip_boxes(boxes: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Clip box coordinates to ``[lo, hi]`` (the normalized image window)."""
    return jnp.clip(boxes, lo, hi)


def flip_boxes_horizontal(boxes: jnp.ndarray) -> jnp.ndarray:
    """Mirror boxes around the vertical axis: x → 1 − x (and swap xmin/xmax)."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([ymin, 1.0 - xmax, ymax, 1.0 - xmin], axis=-1)


# ---------------------------------------------------------------------------
# MultiBox residual encoding (the reference's parameterization)
# ---------------------------------------------------------------------------


def encode_boxes(gt: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    """MultiBox residual target: ``offset = gt − prior`` (corner coords)."""
    return gt - priors


def decode_boxes(offsets: jnp.ndarray, priors: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """Invert :func:`encode_boxes`: ``box = prior + offset``, optionally clipped."""
    boxes = priors + offsets
    return clip_boxes(boxes) if clip else boxes


# ---------------------------------------------------------------------------
# SSD center/log-scale encoding (multi-scale extension, BASELINE configs[3])
# ---------------------------------------------------------------------------

# SSD paper defaults: targets are divided by these before regression.
DEFAULT_VARIANCES = (0.1, 0.1, 0.2, 0.2)


def _corners_to_center(boxes: jnp.ndarray):
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = ymax - ymin
    w = xmax - xmin
    cy = ymin + 0.5 * h
    cx = xmin + 0.5 * w
    return cy, cx, h, w


def encode_boxes_ssd(
    gt: jnp.ndarray,
    priors: jnp.ndarray,
    variances=DEFAULT_VARIANCES,
) -> jnp.ndarray:
    """SSD encoding: ``(Δcy/h_p/v0, Δcx/w_p/v1, log(h/h_p)/v2, log(w/w_p)/v3)``."""
    gcy, gcx, gh, gw = _corners_to_center(gt)
    pcy, pcx, ph, pw = _corners_to_center(priors)
    ph = jnp.maximum(ph, EPS)
    pw = jnp.maximum(pw, EPS)
    ty = (gcy - pcy) / ph / variances[0]
    tx = (gcx - pcx) / pw / variances[1]
    th = jnp.log(jnp.maximum(gh, EPS) / ph) / variances[2]
    tw = jnp.log(jnp.maximum(gw, EPS) / pw) / variances[3]
    return jnp.concatenate([ty, tx, th, tw], axis=-1)


def decode_boxes_ssd(
    offsets: jnp.ndarray,
    priors: jnp.ndarray,
    variances=DEFAULT_VARIANCES,
    clip: bool = True,
) -> jnp.ndarray:
    """Invert :func:`encode_boxes_ssd` back to corner coordinates."""
    ty, tx, th, tw = jnp.split(offsets, 4, axis=-1)
    pcy, pcx, ph, pw = _corners_to_center(priors)
    cy = ty * variances[0] * ph + pcy
    cx = tx * variances[1] * pw + pcx
    h = jnp.exp(th * variances[2]) * ph
    w = jnp.exp(tw * variances[3]) * pw
    boxes = jnp.concatenate(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=-1
    )
    return clip_boxes(boxes) if clip else boxes
