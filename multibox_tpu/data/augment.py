"""On-device augmentation: the jitted XLA preprocessing graph.

TPU-native replacement for the reference's TF-graph augmentations
(ref:inputs.py per SURVEY.md §2 C3: bbox-constrained random crop,
horizontal flip with box flip, color distortion, bilinear resize to the
model input size). Everything here is pure jnp on batched uint8/float
tensors — it fuses into the training step's XLA program, so augmentation
costs ~zero extra HBM round trips (north-star requirement: "augmentation
pinned on-device").

Key op: :func:`crop_and_resize` — crop window + bilinear resize as ONE
gather-free interpolation (compute the source grid, sample with
``jnp.take``-style indexing). This is how TPUs like it: static shapes, two
fused gathers, no dynamic-shape slicing.

Random crop follows slim's ``distorted_bounding_box_crop`` semantics via
K-candidate rejection sampling inside the program: sample K windows, score
their validity (area range + object coverage), take the first valid one,
else fall back to the full image.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.ops import boxes as box_ops


def bilinear_resize(images: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Batched bilinear resize ``[B, H, W, C] → [B, S, S, C]`` (float32),
    matching TF's ``ResizeBilinear`` with ``half_pixel_centers=True``."""
    return crop_and_resize(
        images, jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (images.shape[0], 1)),
        out_size,
    )


def crop_and_resize(
    images: jnp.ndarray, windows: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Crop each image to its normalized window and resize to out_size².

    Args:
      images: ``[B, H, W, C]`` (any float/int dtype; output float32).
      windows: ``[B, 4]`` normalized (ymin, xmin, ymax, xmax).
      out_size: output side length S.

    Half-pixel-center sampling (TF2/PIL convention): output pixel i samples
    source coordinate ``(i + 0.5) / S * crop_extent + crop_start − 0.5``.
    """
    B, H, W, C = images.shape
    images = images.astype(jnp.float32)
    ymin, xmin, ymax, xmax = [windows[:, i] for i in range(4)]

    def axis_coords(lo, hi, size, out):
        # [B, out] source coordinates in pixel space.
        frac = (jnp.arange(out, dtype=jnp.float32) + 0.5) / out  # [out]
        return (lo[:, None] + frac[None, :] * (hi - lo)[:, None]) * size - 0.5

    ys = axis_coords(ymin, ymax, H, out_size)  # [B, S]
    xs = axis_coords(xmin, xmax, W, out_size)  # [B, S]

    def interp_matrix(coords, size):
        # [B, S, size] row-interpolation matrix with two nonzeros per row:
        # (1−w) at floor(c) and w at floor(c)+1. Expressing the bilinear
        # gather as a MATMUL puts resampling on the MXU — on TPU the
        # six-gather formulation (take_along_axis per corner) lowers to
        # scalar-loop gathers and cost ~8.5 ms/step at batch-32 canvas-343,
        # vs ~matmul-free for two einsums (measured round 3, BASELINE.md).
        c = jnp.clip(coords, 0.0, size - 1.0)
        lo = jnp.floor(c)
        w = c - lo
        idx = jnp.arange(size, dtype=jnp.float32)[None, None, :]
        lo = lo[..., None]  # [B, S, 1]
        w = w[..., None]
        return (idx == lo) * (1 - w) + (idx == jnp.minimum(lo + 1, size - 1)) * w

    my = interp_matrix(ys, H)  # [B, S, H]
    mx = interp_matrix(xs, W)  # [B, S, W]
    # rows: [B,S,H] × [B,H,W,C] → [B,S,W,C]; cols: [B,S,W] × … → [B,S,S,C].
    # HIGHEST precision keeps f32 pixel math (default MXU bf16 passes lose
    # ~1/255 on 8-bit sources and break TF-parity tolerances).
    rows = jnp.einsum(
        "bsh,bhwc->bswc", my, images, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "bxw,bswc->bsxc", mx, rows, precision=jax.lax.Precision.HIGHEST
    )


def transform_boxes_to_window(
    boxes: jnp.ndarray, num_boxes: jnp.ndarray, window: jnp.ndarray,
    min_coverage: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Re-express boxes in a crop window's frame; drop boxes mostly outside.

    Args:
      boxes: ``[G, 4]`` normalized (padded).
      num_boxes: scalar int valid count.
      window: ``[4]`` normalized crop window.
      min_coverage: a box survives if ≥ this fraction of its area remains.

    Returns (new_boxes ``[G, 4]`` compacted to the front, new_num scalar,
    order ``[G]`` int32 — the compaction permutation, so callers can apply
    the same reordering to per-box labels).
    """
    G = boxes.shape[0]
    wy0, wx0, wy1, wx1 = window[0], window[1], window[2], window[3]
    h = jnp.maximum(wy1 - wy0, 1e-8)
    w = jnp.maximum(wx1 - wx0, 1e-8)

    # Intersect each box with the window, then rescale into window coords.
    inter = jnp.stack(
        [
            jnp.maximum(boxes[:, 0], wy0),
            jnp.maximum(boxes[:, 1], wx0),
            jnp.minimum(boxes[:, 2], wy1),
            jnp.minimum(boxes[:, 3], wx1),
        ],
        axis=-1,
    )
    inter_area = box_ops.area(inter)
    orig_area = box_ops.area(boxes)
    coverage = jnp.where(orig_area > 0, inter_area / jnp.maximum(orig_area, 1e-12), 0.0)

    new_boxes = jnp.stack(
        [
            (inter[:, 0] - wy0) / h,
            (inter[:, 1] - wx0) / w,
            (inter[:, 2] - wy0) / h,
            (inter[:, 3] - wx0) / w,
        ],
        axis=-1,
    )
    new_boxes = jnp.clip(new_boxes, 0.0, 1.0)

    valid_in = jnp.arange(G) < num_boxes
    keep = jnp.logical_and(valid_in, coverage >= min_coverage)

    # Compact kept boxes to the front (stable) with a sort on drop-rank.
    order = jnp.argsort(jnp.where(keep, jnp.arange(G), G + jnp.arange(G)))
    compacted = new_boxes[order]
    new_num = jnp.sum(keep).astype(jnp.int32)
    compacted = jnp.where(
        (jnp.arange(G) < new_num)[:, None], compacted, 0.0
    )
    return compacted, new_num, order


def sample_crop_window(
    key: jax.Array,
    boxes: jnp.ndarray,
    num_boxes: jnp.ndarray,
    min_object_covered: float = 0.7,
    area_range: Tuple[float, float] = (0.5, 1.0),
    aspect_range: Tuple[float, float] = (0.75, 1.33),
    num_candidates: int = 16,
) -> jnp.ndarray:
    """slim-style distorted-bbox crop: K candidates, first valid wins.

    A candidate is valid if its area/aspect are in range AND at least one
    gt box keeps ≥ ``min_object_covered`` of its area inside the window
    (images with no boxes accept any candidate). Fallback: full image.
    """
    k_area, k_ar, k_pos = jax.random.split(key, 3)
    areas = jax.random.uniform(
        k_area, (num_candidates,), minval=area_range[0], maxval=area_range[1]
    )
    log_ar = jax.random.uniform(
        k_ar,
        (num_candidates,),
        minval=jnp.log(aspect_range[0]),
        maxval=jnp.log(aspect_range[1]),
    )
    ar = jnp.exp(log_ar)
    # window h×w with h*w = area, h/w = ar (normalized units)
    h = jnp.minimum(jnp.sqrt(areas * ar), 1.0)
    w = jnp.minimum(jnp.sqrt(areas / ar), 1.0)
    uv = jax.random.uniform(k_pos, (num_candidates, 2))
    y0 = uv[:, 0] * (1.0 - h)
    x0 = uv[:, 1] * (1.0 - w)
    windows = jnp.stack([y0, x0, y0 + h, x0 + w], axis=-1)  # [K, 4]

    # Validity: some gt box keeps enough of itself inside the window.
    G = boxes.shape[0]
    valid_box = jnp.arange(G) < num_boxes  # [G]

    def coverage(window):
        inter = jnp.stack(
            [
                jnp.maximum(boxes[:, 0], window[0]),
                jnp.maximum(boxes[:, 1], window[1]),
                jnp.minimum(boxes[:, 2], window[2]),
                jnp.minimum(boxes[:, 3], window[3]),
            ],
            axis=-1,
        )
        cov = jnp.where(
            box_ops.area(boxes) > 0,
            box_ops.area(inter) / jnp.maximum(box_ops.area(boxes), 1e-12),
            0.0,
        )
        return jnp.any(jnp.logical_and(valid_box, cov >= min_object_covered))

    has_boxes = num_boxes > 0
    ok = jax.vmap(coverage)(windows)  # [K]
    ok = jnp.logical_or(ok, jnp.logical_not(has_boxes))

    first = jnp.argmax(ok)  # first True (0 if none — guarded below)
    any_ok = jnp.any(ok)
    full = jnp.array([0.0, 0.0, 1.0, 1.0])
    return jnp.where(any_ok, windows[first], full)


def color_distort(key: jax.Array, images: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Brightness / contrast / saturation / hue jitter on floats in [0, 1].

    Hue uses the YIQ rotation formulation — a pure 3×3 matmul per pixel
    (TPU-friendly; equivalent to tf.image.adjust_hue up to gamut clipping).
    """
    kb, kc, ks, kh = jax.random.split(key, 4)
    B = images.shape[0]

    delta = jax.random.uniform(
        kb, (B, 1, 1, 1),
        minval=-cfg.brightness_max_delta, maxval=cfg.brightness_max_delta,
    )
    images = images + delta

    c = jax.random.uniform(
        kc, (B, 1, 1, 1), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    images = (images - mean) * c + mean

    s = jax.random.uniform(ks, (B, 1, 1, 1), minval=0.5, maxval=1.5)
    gray = jnp.mean(images, axis=-1, keepdims=True)
    images = gray + (images - gray) * s

    if cfg.hue_max_delta > 0:
        theta = jax.random.uniform(
            kh, (B,), minval=-cfg.hue_max_delta, maxval=cfg.hue_max_delta
        ) * (2.0 * jnp.pi)
        images = _rotate_hue(images, theta)

    return jnp.clip(images, 0.0, 1.0)


# RGB↔YIQ (NTSC) — hue rotation is a rotation of the IQ chroma plane.
# Kept as plain numpy: module-level jnp arrays would force backend init and
# device transfers at import time (expensive on the remote platform); they
# become traced constants inside the jitted program either way.
import numpy as _np

_RGB_TO_YIQ = _np.array(
    [[0.299, 0.587, 0.114],
     [0.596, -0.274, -0.322],
     [0.211, -0.523, 0.312]], _np.float32
)
# Exact inverse (the textbook 3-decimal YIQ→RGB matrix is only an
# approximation; with it, zero rotation wouldn't be the identity).
_YIQ_TO_RGB = _np.linalg.inv(_RGB_TO_YIQ).astype(_np.float32)


def _rotate_hue(images: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate hue by per-image angle theta (radians). images [B,H,W,3]."""
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    yiq = jnp.einsum("bhwc,dc->bhwd", images, _RGB_TO_YIQ)
    y = yiq[..., 0]
    i = yiq[..., 1] * cos - yiq[..., 2] * sin
    q = yiq[..., 1] * sin + yiq[..., 2] * cos
    return jnp.einsum("bhwc,dc->bhwd", jnp.stack([y, i, q], -1), _YIQ_TO_RGB)


def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    num_boxes: jnp.ndarray,
    cfg: Config,
    labels: jnp.ndarray = None,
):
    """Full train-time augmentation, batched + jitted.

    Args:
      images: ``[B, H, W, 3]`` uint8 (host canvas size).
      boxes: ``[B, G, 4]``, num_boxes: ``[B]``.
      labels: optional ``[B, G]`` int class ids — permuted in lockstep with
        the boxes the crop keeps.

    Returns (images ``[B, S, S, 3]`` float32 in [-1, 1], boxes, num_boxes)
    — plus labels when given.
    """
    B = images.shape[0]
    k_crop, k_flip, k_color = jax.random.split(key, 3)

    images = images.astype(jnp.float32) / 255.0

    if cfg.random_crop:
        crop_keys = jax.random.split(k_crop, B)
        windows = jax.vmap(
            lambda k, b, n: sample_crop_window(
                k, b, n,
                min_object_covered=cfg.crop_min_object_covered,
                area_range=(cfg.crop_min_area, cfg.crop_max_area),
            )
        )(crop_keys, boxes, num_boxes)
        boxes, num_boxes, order = jax.vmap(
            lambda b, n, w: transform_boxes_to_window(b, n, w)
        )(boxes, num_boxes, windows)
        if labels is not None:
            labels = jnp.take_along_axis(labels, order, axis=1)
            G = labels.shape[1]
            lvalid = jnp.arange(G)[None, :] < num_boxes[:, None]
            labels = jnp.where(lvalid, labels, 0)
    else:
        windows = jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (B, 1))

    images = crop_and_resize(images, windows, cfg.input_size)

    if cfg.random_flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (B,))
        flipped = images[:, :, ::-1, :]
        images = jnp.where(do_flip[:, None, None, None], flipped, images)
        fboxes = box_ops.flip_boxes_horizontal(boxes)
        # padded rows are zeros; flipping maps them to (0,1−0,0,1−0) garbage,
        # so re-mask after the select.
        boxes = jnp.where(do_flip[:, None, None], fboxes, boxes)
        G = boxes.shape[1]
        valid = (jnp.arange(G)[None, :] < num_boxes[:, None])[:, :, None]
        boxes = jnp.where(valid, boxes, 0.0)

    if cfg.color_distort:
        images = color_distort(k_color, images, cfg)

    images = (images - 0.5) * 2.0  # slim scaling to [-1, 1]
    if labels is not None:
        return images, boxes, num_boxes, labels
    return images, boxes, num_boxes


def preprocess_eval(images: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Eval-mode preprocessing: resize + scale to [-1, 1] (no augmentation)."""
    images = images.astype(jnp.float32) / 255.0
    images = bilinear_resize(images, out_size)
    return (images - 0.5) * 2.0
