"""Configuration: typed dataclass + reference-compatible YAML loading.

The reference uses YAML → easydict with UPPER_CASE keys (ref:config.py,
SURVEY.md §2 C1). We keep that YAML surface — a reference config file ports
mechanically — on top of a typed dataclass with snake_case fields.
Unknown keys warn instead of failing so older configs load.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass
from typing import Optional, Sequence

import yaml

log = logging.getLogger(__name__)


@dataclass
class Config:
    # --- model ---
    input_size: int = 299
    num_priors: int = 256
    backbone: str = "inception_v3"  # "inception_v3" | "mobilenet_v2"
    mobilenet_width: float = 1.0
    head_type: str = "multibox"  # "multibox" | "ssd"
    num_classes: int = 1
    bottleneck_features: int = 96
    ssd_endpoints: Sequence[str] = ("Mixed_5d", "Mixed_6e", "Mixed_7c")
    ssd_priors_per_cell: int = 6
    box_encoding: str = "multibox"  # "multibox" (residual) | "ssd"
    compute_dtype: str = "bfloat16"
    # slim parity default; lower (e.g. 0.9) for short training runs or the
    # inference-mode BN statistics never leave their init values.
    bn_momentum: float = 0.9997
    # rematerialize the backbone in the backward pass: trades recompute
    # FLOPs for activation memory. Measured on the v5e (BASELINE.md
    # "Large-batch training sweep"): +19.7 % step time at b128, and net
    # FASTER at b256 where it relieves HBM pressure.
    remat: bool = False

    # --- training ---
    batch_size: int = 32
    # >1 → split each step's batch into this many sequential microbatches,
    # average their gradients, and apply the optimizer ONCE — the effective
    # batch stays batch_size while activation memory scales with
    # batch_size/grad_accum_steps (compose with `remat` for the largest
    # effective batches). Measured (BASELINE.md sweep): effective b256 as
    # accum2×b128 costs +7.2 % over two plain b128 steps and beats the
    # plain b256 program by 22 %. batch_size must be divisible by it. BN caveat
    # (standard for grad accumulation): train-mode BN normalizes over each
    # MICRObatch, and the running stats take grad_accum_steps momentum
    # updates per optimizer step.
    grad_accum_steps: int = 1
    max_num_bboxes: int = 16
    location_loss_alpha: float = 1.0  # α weight on the location loss
    matching: str = "greedy"  # "greedy" | "hungarian"
    hybrid_conf_weight: float = 0.0  # >0 → loss-aware (hybrid) matching
    hard_negative_ratio: float = 3.0  # negatives per positive; 0 → all
    # >0 → log N input canvases (gt boxes burned in) to TensorBoard every
    # this many steps — the reference's input-image summaries (SURVEY.md
    # §5.5). 0 = off (image summaries cost host work + event-file bytes).
    image_summary_steps: int = 0
    # >0 → SSD dense matching (arXiv:1512.02325 §2.2): on top of the
    # bipartite best matches, every prior with best-gt IoU ≥ this trains
    # as a positive. Under 1-to-1 matching + crop augmentation a prior is
    # positive only ~25% of steps and its confidence equilibrates there
    # (measured, BASELINE.md round-3); 0 keeps pure reference behavior.
    multi_match_iou: float = 0.0
    # Confidence loss: "bce" (reference) | "focal" (RetinaNet-style
    # focal sigmoid CE — useful when conf training plateaus under extreme
    # class imbalance; pair with hard_negative_ratio: 0).
    conf_loss: str = "bce"
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # Raw tfrecord label ids have cfg.label_offset subtracted before use —
    # set 1 for conventional 1-based datasets (VOC/COCO with 0=background).
    # After the offset every label must lie in [0, num_classes): the host
    # pipeline fails loudly on violations, and the loss reports a
    # num_bad_labels metric as defense in depth.
    label_offset: int = 0
    initial_learning_rate: float = 0.01
    learning_rate_decay_factor: float = 0.94
    num_epochs_per_decay: float = 4.0
    # LR schedule shape: "exponential" (slim staircase, reference parity)
    # | "cosine". min_learning_rate floors either schedule (the staircase
    # otherwise decays below useful magnitudes on long runs); warmup_steps
    # prepends a linear ramp from 0.
    lr_schedule: str = "exponential"
    min_learning_rate: float = 0.0
    warmup_steps: int = 0
    num_train_examples: int = 5000
    # Optimizer family (slim train_image_classifier surface): rmsprop is
    # the reference default; momentum/sgd/adam are the other slim-era
    # choices. "momentum" reuses rmsprop_momentum as its coefficient.
    optimizer: str = "rmsprop"
    rmsprop_decay: float = 0.9
    rmsprop_epsilon: float = 1.0
    rmsprop_momentum: float = 0.9
    adam_epsilon: float = 1e-8
    # >0 → clip gradients to this global norm before the optimizer update
    # (slim's clip_gradient_norm flag). 0 = off.
    clip_gradient_norm: float = 0.0
    moving_average_decay: float = 0.9999
    max_number_of_steps: int = 100000
    save_every_steps: int = 1000
    log_every_steps: int = 100
    keep_checkpoints: int = 3
    seed: int = 0
    # >0 → the train CLI supervises bounded-lifetime child processes of
    # this many steps each, resuming from the logdir between them
    # (tf.train.Supervisor lineage: a crashed worker is restarted from the
    # last checkpoint instead of killing the run). Also the mitigation for
    # host-side RAM growth in long runs on leaky device-client stacks —
    # this container's relay client leaks ~10-45 MB per chunked execution
    # (CLAUDE.md), so multi-thousand-step runs here should set this.
    restart_every_steps: int = 0

    # --- host input pipeline (decode-bound-host knobs; see data/pipeline) ---
    decode_draft: bool = False  # libjpeg DCT-scaled decode for train inputs
    decode_cache_items: int = 0  # RAM-cache N decoded items across epochs
    # Ship K batches per host→device transfer and run K train steps in one
    # device call (lax.scan). On high-latency links (this container's
    # relay: ~0.4s per transfer regardless of size) per-batch transfers
    # dominate the step; K=8 amortizes the RTT 8×. 1 = one batch per
    # transfer. Same data order/augmentation keys/BN-stat updates as K=1
    # (pinned bitwise at lr=0); with lr>0 the scanned program's
    # reassociation-level rounding diverges from the straight-line one and
    # training chaos amplifies it — statistically equivalent, not bitwise.
    steps_per_host_transfer: int = 1

    # NMS flavor: "hard" (reference semantics, Pallas-accelerated) or
    # "soft" (Gaussian score decay, arXiv:1704.04503 — occluding true
    # positives keep reduced scores instead of vanishing; jnp path).
    nms_mode: str = "hard"
    soft_nms_sigma: float = 0.5

    # --- augmentation (train input pipeline) ---
    augment: bool = True
    random_flip: bool = True
    random_crop: bool = True
    crop_min_object_covered: float = 0.7
    crop_min_area: float = 0.5
    crop_max_area: float = 1.0
    color_distort: bool = True
    brightness_max_delta: float = 0.125
    contrast_range: Sequence[float] = (0.5, 1.5)
    hue_max_delta: float = 0.05  # fraction of a full hue rotation; 0 = off

    # --- detection / NMS ---
    detect_score_threshold: float = 0.01
    nms_iou_threshold: float = 0.5
    max_detections: int = 100
    use_ema_for_detect: bool = True
    # Multi-class postprocess: None = auto (per-class sweep when
    # num_classes > 1 — the standard VOC/COCO protocol: every (prior,
    # class) score is a candidate, NMS within each class). False = the
    # cheaper argmax-class-per-prior approximation. Class-agnostic models
    # ignore this.
    per_class_detect: Optional[bool] = None
    # Per-image candidate budget for the per-class sweep: the [P·C] score
    # grid is top-k-pruned to this many candidates before NMS so the NMS
    # cost stays independent of num_classes (static shapes). Default
    # justified by measurement (BASELINE.md "detect_candidates budget
    # sweep"): exactly saturated at 3 classes and within 0.0003 mAP@0.5
    # of a 16× budget at 32 classes × 9.5k priors (the eval protocol's
    # max_detections=100 cap bounds how much score-grid tail can matter);
    # 256 measurably loses ~0.01 mAP@0.5. Raise for class counts ≫ 32.
    detect_candidates: int = 1024
    # Horizontal-flip test-time augmentation (classic detection-era TTA):
    # the detect program runs the backbone on the image AND its mirror in
    # ONE doubled batch (a single apply — MXU-friendly), mirrors the
    # flipped pass's decoded boxes back, and feeds the union of candidates
    # through one NMS pass. ~2× detect FLOPs; on the pinned multi-class
    # eval it measured slightly NEGATIVE (−0.004 mAP@0.5 / −0.008 COCO —
    # BASELINE.md "Int8 PTQ and flip-TTA quality": the synth classes are
    # mirror-symmetric, so the mirror adds NMS duplicates, not evidence).
    # Kept for photographic datasets where flip-TTA classically helps;
    # validate per dataset. Off by default (reference semantics).
    flip_tta: bool = False
    # Post-training quantization of the detect path: "none" | "int8".
    # int8 folds BN, quantizes the 94 backbone convs to symmetric int8
    # (per-channel weights, calibrated per-tensor activations) and runs
    # them as int8×int8→int32 MXU convs — see multibox_tpu/quantize.py.
    # Heads stay f32. Detect/eval CLIs calibrate on the first
    # quant_calib_batches batches of their input.
    quantize: str = "none"
    quant_calib_batches: int = 4

    # --- parallel ---
    data_axis: str = "data"

    # --- ops backend ---
    # Pallas TPU kernel routing. None = auto (the measured-fastest mix on
    # a real TPU backend: Pallas batch-native NMS; XLA for matching,
    # convs and head — BASELINE.md decision matrix); True additionally
    # routes greedy matching and the head/1×1-conv matmuls through the
    # Pallas kernels; False = jnp/XLA everywhere. Every kernel keeps a
    # semantics-identical jnp fallback; auto never engages Pallas off-TPU.
    use_pallas: Optional[bool] = None

    # --- debugging / observability (SURVEY.md §5.1/§5.2) ---
    debug_nans: bool = False  # jax_debug_nans toggle
    profile_steps: int = 0  # >0: capture a jax.profiler trace of N steps


# Reference-era UPPER_CASE YAML key → dataclass field.
_KEY_ALIASES = {
    "INPUT_SIZE": "input_size",
    "IMAGE_SIZE": "input_size",
    "NUM_PRIORS": "num_priors",
    "BATCH_SIZE": "batch_size",
    "MAX_NUM_BBOXES": "max_num_bboxes",
    "LOCATION_LOSS_ALPHA": "location_loss_alpha",
    "INITIAL_LEARNING_RATE": "initial_learning_rate",
    "LEARNING_RATE_DECAY_FACTOR": "learning_rate_decay_factor",
    "NUM_EPOCHS_PER_DECAY": "num_epochs_per_decay",
    "NUM_TRAIN_EXAMPLES": "num_train_examples",
    "OPTIMIZER": "optimizer",
    "CLIP_GRADIENT_NORM": "clip_gradient_norm",
    "MOMENTUM": "rmsprop_momentum",
    "RMSPROP_DECAY": "rmsprop_decay",
    "RMSPROP_EPSILON": "rmsprop_epsilon",
    "RMSPROP_MOMENTUM": "rmsprop_momentum",
    "MOVING_AVERAGE_DECAY": "moving_average_decay",
    "MAX_NUMBER_OF_STEPS": "max_number_of_steps",
    "NUM_STEPS": "max_number_of_steps",
    "RANDOM_FLIP": "random_flip",
    "RANDOM_CROP": "random_crop",
    "COLOR_DISTORT": "color_distort",
    "AUGMENT": "augment",
    "DETECT_SCORE_THRESHOLD": "detect_score_threshold",
    "CONFIDENCE_THRESHOLD": "detect_score_threshold",
    "NMS_IOU_THRESHOLD": "nms_iou_threshold",
    "MAX_DETECTIONS": "max_detections",
    "SEED": "seed",
}

_FIELDS = {f.name for f in dataclasses.fields(Config)}


def parse_config_file(path: str) -> Config:
    """Load a YAML config; accepts both snake_case and the reference's
    UPPER_CASE keys. The reference API name is kept (SURVEY.md §1)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return parse_config_dict(raw)


def parse_config_dict(raw: dict) -> Config:
    kwargs = {}
    for key, value in raw.items():
        name = _KEY_ALIASES.get(key, key.lower() if key.isupper() else key)
        if name in _FIELDS:
            kwargs[name] = value
        else:
            log.warning("ignoring unknown config key: %s", key)
    return Config(**kwargs)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=True)
