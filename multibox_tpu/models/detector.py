"""Full detector: Inception-v3 backbone + MultiBox/SSD head.

The public model surface of the framework — the equivalent of the
reference's ``model.build(inputs, cfg) → (locations, confidences)``
(SURVEY.md §2 C4/C5) — as a single flax module.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from multibox_tpu.models.heads import MultiBoxHead, SSDHead
from multibox_tpu.models.inception_v3 import InceptionV3
from multibox_tpu.models.mobilenet import MobileNetV2


class MultiBoxDetector(nn.Module):
    """Inception-v3 + detection head → ``(locations, confidences)``.

    Args (static):
      num_priors: P (must equal the loaded priors' row count).
      head_type: ``"multibox"`` (FC head over Mixed_7c, the reference's
        design) or ``"ssd"`` (multi-scale conv heads).
      num_classes: 1 for class-agnostic detection (reference behavior).
      compute_dtype: bfloat16 by default (MXU-native); params stay f32.
      ssd_endpoints / ssd_priors_per_cell: layout for the SSD head; the
        priors must come from ``generate_priors_multiscale`` with matching
        feature-map sizes.

    Input images: ``[B, H, W, 3]`` float32 in ``[-1, 1]``
    (``inception_v3.preprocess_slim``). Default H = W = 299.
    """

    num_priors: int
    backbone: str = "inception_v3"  # "inception_v3" | "mobilenet_v2"
    mobilenet_width: float = 1.0
    head_type: str = "multibox"
    num_classes: int = 1
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    folded: bool = False  # inference-only BN-folded backbone
    use_pallas: Optional[bool] = None  # Pallas fused blocks (None = auto/TPU)
    quantize: Optional[str] = None  # int8 PTQ backbone: "int8" | "calib"
    bottleneck_features: int = 96
    ssd_endpoints: tuple = ("Mixed_5d", "Mixed_6e", "Mixed_7c")
    ssd_priors_per_cell: int = 6

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        if self.backbone == "inception_v3":
            endpoints = InceptionV3(
                compute_dtype=self.compute_dtype,
                bn_momentum=self.bn_momentum,
                folded=self.folded,
                use_pallas=self.use_pallas,
                quantize=self.quantize,
                name="InceptionV3",
            )(images, train=train)
            final_endpoint = "Mixed_7c"
        elif self.backbone == "mobilenet_v2":
            endpoints = MobileNetV2(
                width=self.mobilenet_width,
                compute_dtype=self.compute_dtype,
                bn_momentum=self.bn_momentum,
                folded=self.folded,
                quantize=self.quantize,
                name="MobileNetV2",
            )(images, train=train)
            final_endpoint = "Final"
        else:
            raise ValueError(f"unknown backbone: {self.backbone}")
        if self.head_type == "multibox":
            head = MultiBoxHead(
                num_priors=self.num_priors,
                num_classes=self.num_classes,
                bottleneck_features=self.bottleneck_features,
                endpoint=final_endpoint,
                compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
                name="MultiBoxHead",
            )
        elif self.head_type == "ssd":
            ssd_endpoints = tuple(self.ssd_endpoints)
            missing = [e for e in ssd_endpoints if e not in endpoints]
            if missing:
                if self.backbone == "mobilenet_v2" and ssd_endpoints == (
                    "Mixed_5d", "Mixed_6e", "Mixed_7c",
                ):
                    # Inception defaults on the mobilenet backbone: map to
                    # the equivalent stride-8/16/32 pyramid automatically.
                    ssd_endpoints = ("Stage_2", "Stage_4", "Stage_6")
                else:
                    raise ValueError(
                        f"ssd_endpoints {missing} not produced by backbone "
                        f"{self.backbone!r}; available: {sorted(endpoints)}"
                    )
            head = SSDHead(
                endpoints_spec=ssd_endpoints,
                priors_per_cell=self.ssd_priors_per_cell,
                num_classes=self.num_classes,
                compute_dtype=self.compute_dtype,
                name="SSDHead",
            )
        else:
            raise ValueError(f"unknown head_type: {self.head_type}")
        loc, conf = head(endpoints, train=train)
        if loc.shape[1] != self.num_priors:
            raise ValueError(
                f"head produced {loc.shape[1]} priors but num_priors="
                f"{self.num_priors}; for head_type='ssd' the priors file must "
                "be generated with matching feature_map_sizes/priors_per_cell"
            )
        return loc, conf
