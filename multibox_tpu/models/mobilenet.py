"""MobileNetV2-style backbone (flax, NHWC, TPU-first).

Second backbone family: the reference's exported graph fed a *mobile*
detector downstream (ref:export.py / SURVEY.md §2 C13), so an edge-class
backbone is a first-class citizen here. Implements the inverted-residual
architecture of Sandler et al., "MobileNetV2: Inverted Residuals and
Linear Bottlenecks" (arXiv:1801.04381) with named endpoints compatible
with the detection heads (single-scale ``Final`` endpoint for the
MultiBox FC head; three pyramid endpoints for the SSD head).

TPU note: depthwise convs don't use the MXU (they're VPU work), but the
model is ~10× fewer FLOPs than Inception-v3 — latency-optimized serving.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (expansion t, channels c, repeats n, stride s) per arXiv:1801.04381 Table 2.
_INVERTED_RESIDUAL_SPEC = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# Endpoints exposed to heads: taken after the last block of the marked
# stages (stride 8 / 16 / 32 pyramid), plus the final 1x1-conv features.
ENDPOINTS = ("Stage_2", "Stage_4", "Stage_6", "Final")


class ConvBNRelu6(nn.Module):
    """Conv→BN→ReLU6 unit with the same three inference variants as the
    Inception unit (models/inception_v3.py ConvBnRelu): live (conv+BN),
    ``folded`` (BN baked into conv weight+bias via
    ``inception_v3.fold_batch_norms`` — which handles this unit's scale-ful
    BN), and ``quantize`` (int8 PTQ on the folded weights, models/quant)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    relu: bool = True
    folded: bool = False
    quantize: Any = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quantize:
            if not self.folded:
                raise ValueError("quantize requires the folded model variant")
            from multibox_tpu.models.quant import QuantConv

            x = QuantConv(
                self.features,
                tuple(self.kernel),
                strides=tuple(self.strides),
                groups=self.groups,
                calibrate=self.quantize == "calib",
                compute_dtype=self.compute_dtype,
                name="Conv",
            )(x)
            if self.relu:
                x = jnp.minimum(nn.relu(x), 6.0)
            return x
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=self.folded,
            dtype=self.compute_dtype,
            name="Conv",
        )(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
                dtype=self.compute_dtype,
                name="BatchNorm",
            )(x)
        if self.relu:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    folded: bool = False
    quantize: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        var = dict(
            compute_dtype=dt, bn_momentum=self.bn_momentum,
            folded=self.folded, quantize=self.quantize,
        )
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = ConvBNRelu6(
                cin * self.expand, (1, 1), name="Expand", **var
            )(h, train)
        h = ConvBNRelu6(
            h.shape[-1], (3, 3), strides=(self.stride, self.stride),
            groups=h.shape[-1], name="Depthwise", **var
        )(h, train)
        h = ConvBNRelu6(
            self.features, (1, 1), relu=False, name="Project", **var
        )(h, train)
        if self.stride == 1 and cin == self.features:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """MobileNetV2 feature extractor with named endpoints.

    Input ``[B, S, S, 3]`` in [-1, 1]; ``Final`` is the 1280-channel
    feature map at stride 32 (e.g. 10×10 for a 320 input, 7×7 for 224).
    """

    width: float = 1.0
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    folded: bool = False  # inference-only: BN baked into conv weights
    quantize: Any = None  # int8 PTQ on the folded weights: "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.compute_dtype
        x = x.astype(dt)
        var = dict(
            compute_dtype=dt, bn_momentum=self.bn_momentum,
            folded=self.folded, quantize=self.quantize,
        )

        def c(ch):
            ch = int(ch * self.width)
            return max((ch + 4) // 8 * 8, 8)  # round to multiple of 8

        eps: Dict[str, jnp.ndarray] = {}
        x = ConvBNRelu6(
            c(32), (3, 3), strides=(2, 2), name="Stem", **var
        )(x, train)
        for stage, (t, ch, n, s) in enumerate(_INVERTED_RESIDUAL_SPEC):
            for i in range(n):
                x = InvertedResidual(
                    c(ch), s if i == 0 else 1, t,
                    compute_dtype=dt, bn_momentum=self.bn_momentum,
                    folded=self.folded, quantize=self.quantize,
                    name=f"Stage_{stage}/Block_{i}",
                )(x, train)
            eps[f"Stage_{stage}"] = x
        x = ConvBNRelu6(
            max(c(1280), 1280), (1, 1), name="Head", **var
        )(x, train)
        eps["Final"] = x
        return eps
