"""Inception-v3 backbone in flax (NHWC, TPU-first).

Re-implementation of the architecture of Szegedy et al., "Rethinking the
Inception Architecture for Computer Vision" (arXiv:1512.00567), matching the
tf-slim ``inception_v3_base`` topology the reference uses as its backbone
(ref:model.py → slim ``nets.inception_v3`` per SURVEY.md §2 C4) so that
ImageNet checkpoints trained with slim can be imported name-by-name
(``multibox_tpu.models.tf_import``).

TPU-first choices:
- NHWC layout throughout (XLA:TPU's native conv layout).
- Separate ``compute_dtype`` (bfloat16 by default — MXU-friendly) from
  parameter dtype (float32). Casting happens at module boundaries; XLA
  fuses the casts into the convs.
- BatchNorm uses slim's conventions (eps 1e-3, no scale γ) so imported
  moving statistics line up bit-for-bit.
- Static shapes; no python control flow on traced values.

Module/parameter naming deliberately mirrors slim scopes
(``Conv2d_1a_3x3``, ``Mixed_5b/Branch_0/Conv2d_0a_1x1``...) to make the
checkpoint import a pure name-mapping exercise.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multibox_tpu.models.layers import FusedConv1x1

# Endpoints exposed to detection heads, in forward order.
ENDPOINTS = (
    "Conv2d_1a_3x3",
    "Conv2d_2a_3x3",
    "Conv2d_2b_3x3",
    "MaxPool_3a_3x3",
    "Conv2d_3b_1x1",
    "Conv2d_4a_3x3",
    "MaxPool_5a_3x3",
    "Mixed_5b",
    "Mixed_5c",
    "Mixed_5d",
    "Mixed_6a",
    "Mixed_6b",
    "Mixed_6c",
    "Mixed_6d",
    "Mixed_6e",
    "Mixed_7a",
    "Mixed_7b",
    "Mixed_7c",
)


class ConvBN(nn.Module):
    """slim-style conv unit: Conv(no bias) → BatchNorm(no γ) → ReLU."""

    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    compute_dtype: Any = jnp.bfloat16
    # slim's 0.9997 assumes ~100k-step schedules; short runs need a lower
    # momentum or the inference-mode stats stay at their init values.
    bn_momentum: float = 0.9997
    # folded=True: inference-only variant with BN pre-folded into the conv
    # (Conv gains a bias, no BatchNorm op) — see fold_batch_norms.
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quantize:
            # Int8 PTQ path (requires folded=True: BN is already baked
            # into the conv weights that were quantized). See models.quant.
            if not self.folded:
                raise ValueError("quantize requires the folded model variant")
            from multibox_tpu.models.quant import QuantConv

            y = QuantConv(
                self.features,
                tuple(self.kernel),
                strides=tuple(self.strides),
                padding=self.padding,
                calibrate=self.quantize == "calib",
                compute_dtype=self.compute_dtype,
                name="Conv",
            )(x)
            return nn.relu(y)
        if (
            self.folded
            and tuple(self.kernel) == (1, 1)
            and tuple(self.strides) == (1, 1)
        ):
            # Fused conv+bias+ReLU block: on the Pallas path the 1×1 conv
            # runs as a fused MXU matmul with bias/ReLU in the epilogue
            # (north star "Pallas-fused conv/activation blocks"); the
            # fallback is the same matmul in XLA. Param tree identical to
            # the nn.Conv branch below (FusedConv1x1 is param-compatible).
            return FusedConv1x1(
                self.features,
                use_bias=True,
                relu=True,
                use_pallas=self.use_pallas,
                dtype=self.compute_dtype,
                name="Conv",
            )(x)
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=self.folded,
            dtype=self.compute_dtype,
            name="Conv",
        )(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
                use_scale=False,  # slim default: γ fixed at 1
                dtype=self.compute_dtype,
                name="BatchNorm",
            )(x)
        return nn.relu(x)


def _max_pool(x, window, strides, padding="VALID"):
    return nn.max_pool(x, (window, window), (strides, strides), padding)


def _avg_pool_3x3_same(x):
    # count_include_pad=False: divide by the number of valid elements in the
    # window (TF semantics) — with the default the border pixels differ and
    # checkpoint-parity breaks.
    return nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False)


class InceptionA(nn.Module):
    """35×35 Inception block (Mixed_5b/5c/5d): 1x1 / 5x5 / double-3x3 / pool."""

    pool_features: int
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        b0 = ConvBN(64, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_0/Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(48, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(64, (5, 5), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0b_5x5")(b1, train)
        b2 = ConvBN(64, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0a_1x1")(x, train)
        b2 = ConvBN(96, (3, 3), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0b_3x3")(b2, train)
        b2 = ConvBN(96, (3, 3), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0c_3x3")(b2, train)
        b3 = _avg_pool_3x3_same(x)
        b3 = ConvBN(
            self.pool_features, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_3/Conv2d_0b_1x1"
        )(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    """35→17 grid reduction (Mixed_6a)."""

    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        b0 = ConvBN(
            384, (3, 3), strides=(2, 2), padding="VALID", compute_dtype=dt,
            bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_0/Conv2d_1a_1x1",
        )(x, train)
        b1 = ConvBN(64, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(96, (3, 3), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0b_3x3")(b1, train)
        b1 = ConvBN(
            96, (3, 3), strides=(2, 2), padding="VALID", compute_dtype=dt,
            bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_1a_1x1",
        )(b1, train)
        b2 = _max_pool(x, 3, 2)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionB(nn.Module):
    """17×17 Inception block (Mixed_6b..6e): factorized 7×7 convolutions."""

    channels_7x7: int
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        c7 = self.channels_7x7
        b0 = ConvBN(192, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_0/Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(c7, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(c7, (1, 7), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0b_1x7")(b1, train)
        b1 = ConvBN(192, (7, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0c_7x1")(b1, train)
        b2 = ConvBN(c7, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0a_1x1")(x, train)
        b2 = ConvBN(c7, (7, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0b_7x1")(b2, train)
        b2 = ConvBN(c7, (1, 7), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0c_1x7")(b2, train)
        b2 = ConvBN(c7, (7, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0d_7x1")(b2, train)
        b2 = ConvBN(192, (1, 7), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0e_1x7")(b2, train)
        b3 = _avg_pool_3x3_same(x)
        b3 = ConvBN(192, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_3/Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    """17→8 grid reduction (Mixed_7a)."""

    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        b0 = ConvBN(192, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_0/Conv2d_0a_1x1")(x, train)
        b0 = ConvBN(
            320, (3, 3), strides=(2, 2), padding="VALID", compute_dtype=dt,
            bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_0/Conv2d_1a_3x3",
        )(b0, train)
        b1 = ConvBN(192, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(192, (1, 7), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0b_1x7")(b1, train)
        b1 = ConvBN(192, (7, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0c_7x1")(b1, train)
        b1 = ConvBN(
            192, (3, 3), strides=(2, 2), padding="VALID", compute_dtype=dt,
            bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_1a_3x3",
        )(b1, train)
        b2 = _max_pool(x, 3, 2)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
    """8×8 Inception block (Mixed_7b/7c): expanded-filter-bank outputs."""

    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        b0 = ConvBN(320, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_0/Conv2d_0a_1x1")(x, train)

        b1 = ConvBN(384, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0a_1x1")(x, train)
        b1a = ConvBN(384, (1, 3), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0b_1x3")(b1, train)
        b1b = ConvBN(384, (3, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_1/Conv2d_0b_3x1")(b1, train)
        b1 = jnp.concatenate([b1a, b1b], axis=-1)

        b2 = ConvBN(448, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0a_1x1")(x, train)
        b2 = ConvBN(384, (3, 3), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0b_3x3")(b2, train)
        b2a = ConvBN(384, (1, 3), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0c_1x3")(b2, train)
        b2b = ConvBN(384, (3, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_2/Conv2d_0d_3x1")(b2, train)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)

        b3 = _avg_pool_3x3_same(x)
        b3 = ConvBN(192, (1, 1), compute_dtype=dt, bn_momentum=self.bn_momentum, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Branch_3/Conv2d_0b_1x1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Inception-v3 feature extractor returning named endpoints.

    Input: ``[B, 299, 299, 3]`` float, scaled to ``[-1, 1]`` (slim
    convention ``(x/255 − 0.5)×2``; the input pipeline handles scaling).
    Output: dict of endpoint name → feature map; ``Mixed_7c`` is
    ``[B, 8, 8, 2048]``.
    """

    compute_dtype: Any = jnp.bfloat16
    final_endpoint: str = "Mixed_7c"
    bn_momentum: float = 0.9997
    folded: bool = False
    use_pallas: Optional[bool] = None  # Pallas fused 1x1 conv blocks (folded)
    quantize: Optional[str] = None  # int8 PTQ (folded): "int8" | "calib"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.compute_dtype
        bn = self.bn_momentum
        x = x.astype(dt)
        eps: Dict[str, jnp.ndarray] = {}

        def done(name):
            return name == self.final_endpoint

        # Stem: 299×299×3 → 35×35×192
        x = ConvBN(32, (3, 3), (2, 2), "VALID", dt, bn, self.folded, self.use_pallas, self.quantize, name="Conv2d_1a_3x3")(x, train)
        eps["Conv2d_1a_3x3"] = x
        if done("Conv2d_1a_3x3"):
            return eps
        x = ConvBN(32, (3, 3), padding="VALID", compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Conv2d_2a_3x3")(x, train)
        eps["Conv2d_2a_3x3"] = x
        if done("Conv2d_2a_3x3"):
            return eps
        x = ConvBN(64, (3, 3), compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Conv2d_2b_3x3")(x, train)
        eps["Conv2d_2b_3x3"] = x
        if done("Conv2d_2b_3x3"):
            return eps
        x = _max_pool(x, 3, 2)
        eps["MaxPool_3a_3x3"] = x
        if done("MaxPool_3a_3x3"):
            return eps
        x = ConvBN(80, (1, 1), padding="VALID", compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Conv2d_3b_1x1")(x, train)
        eps["Conv2d_3b_1x1"] = x
        if done("Conv2d_3b_1x1"):
            return eps
        x = ConvBN(192, (3, 3), padding="VALID", compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Conv2d_4a_3x3")(x, train)
        eps["Conv2d_4a_3x3"] = x
        if done("Conv2d_4a_3x3"):
            return eps
        x = _max_pool(x, 3, 2)
        eps["MaxPool_5a_3x3"] = x
        if done("MaxPool_5a_3x3"):
            return eps

        # 35×35 blocks
        for name, pool_features in (
            ("Mixed_5b", 32),
            ("Mixed_5c", 64),
            ("Mixed_5d", 64),
        ):
            x = InceptionA(pool_features, compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name=name)(x, train)
            eps[name] = x
            if done(name):
                return eps

        x = ReductionA(compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Mixed_6a")(x, train)
        eps["Mixed_6a"] = x
        if done("Mixed_6a"):
            return eps

        # 17×17 blocks
        for name, c7 in (
            ("Mixed_6b", 128),
            ("Mixed_6c", 160),
            ("Mixed_6d", 160),
            ("Mixed_6e", 192),
        ):
            x = InceptionB(c7, compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name=name)(x, train)
            eps[name] = x
            if done(name):
                return eps

        x = ReductionB(compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name="Mixed_7a")(x, train)
        eps["Mixed_7a"] = x
        if done("Mixed_7a"):
            return eps

        # 8×8 blocks
        for name in ("Mixed_7b", "Mixed_7c"):
            x = InceptionC(compute_dtype=dt, bn_momentum=bn, folded=self.folded, use_pallas=self.use_pallas, quantize=self.quantize, name=name)(x, train)
            eps[name] = x
            if done(name):
                return eps
        return eps


def preprocess_slim(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """slim input scaling: uint8 [0,255] → float [−1, 1]."""
    return (images_uint8.astype(jnp.float32) / 255.0 - 0.5) * 2.0


def fold_batch_norms(variables):
    """Fold BN statistics into conv weights for the ``folded=True`` model.

    ``BN(conv(x)) = conv'(x) + b'`` with ``w' = w·γ·s`` and
    ``b' = β − μ·γ·s`` where ``s = 1/√(σ²+ε)``. Works for both backbone
    conventions: Inception's slim-style BN has no γ (``use_scale=False`` →
    γ≡1, the classic slim fold) while MobileNetV2's BN carries a learned γ
    that is consumed into the kernel here. Returns a params dict for the
    folded model variant (Conv has a bias, no BatchNorm op) — one
    normalization pass per conv unit eliminated at inference.
    """
    import flax

    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables.get("batch_stats", {}))
    eps = 1e-3

    def bn_scale(unit):
        """γ/√(σ²+ε) for the unit, with γ=1 when BN has no scale param."""
        s = 1.0 / jnp.sqrt(stats[unit + ("BatchNorm", "var")].astype(
            jnp.float32) + eps)
        gamma = params.get(unit + ("BatchNorm", "scale"))
        if gamma is not None:
            s = s * gamma.astype(jnp.float32)
        return s

    out_params = {}
    for key, value in params.items():
        if key[-2:] == ("Conv", "kernel"):
            unit = key[:-2]
            if unit + ("BatchNorm", "var") in stats:
                out_params[key] = (
                    value.astype(jnp.float32) * bn_scale(unit)
                ).astype(value.dtype)
                continue
        if key[-2:] == ("BatchNorm", "bias"):
            unit = key[:-2]
            bn_mean = unit + ("BatchNorm", "mean")
            if bn_mean in stats:
                bias = value.astype(jnp.float32) - stats[bn_mean].astype(
                    jnp.float32
                ) * bn_scale(unit)
                out_params[unit + ("Conv", "bias")] = bias.astype(value.dtype)
                continue
        if key[-2:] == ("BatchNorm", "scale"):
            # γ was consumed into the kernel above; the folded model has no
            # BatchNorm module to receive it.
            if key[:-2] + ("BatchNorm", "var") in stats:
                continue
        out_params[key] = value
    return {"params": flax.traverse_util.unflatten_dict(out_params)}
