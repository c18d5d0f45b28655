"""Core detection ops: box geometry, bipartite matching, NMS.

All ops are pure jnp (jit/vmap/grad-compatible, static shapes). Hot paths
have Pallas TPU kernels under ``multibox_tpu.ops.pallas`` selected via the
``use_pallas`` flags; every kernel has a jnp fallback with identical
semantics (the fallback is the spec, the kernel is the fast path).
"""

from multibox_tpu.ops.boxes import (
    area,
    clip_boxes,
    decode_boxes,
    decode_boxes_ssd,
    encode_boxes,
    encode_boxes_ssd,
    flip_boxes_horizontal,
    intersection,
    iou_matrix,
    iou_pairwise,
)
from multibox_tpu.ops.matching import (
    greedy_match,
    hungarian_match,
    match_priors,
)
from multibox_tpu.ops.nms import (
    batched_nms,
    nms,
)

__all__ = [
    "area",
    "clip_boxes",
    "decode_boxes",
    "decode_boxes_ssd",
    "encode_boxes",
    "encode_boxes_ssd",
    "flip_boxes_horizontal",
    "intersection",
    "iou_matrix",
    "iou_pairwise",
    "greedy_match",
    "hungarian_match",
    "match_priors",
    "batched_nms",
    "nms",
]
