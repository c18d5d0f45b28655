"""Pallas-backed drop-in layers (param-compatible with flax linen).

``FusedDense`` / ``FusedConv1x1`` declare EXACTLY the parameter trees of
``nn.Dense`` / ``nn.Conv`` (same names, shapes, initializers), so
checkpoints are interchangeable regardless of the compute path. With
``use_pallas=True`` the forward routes through
``ops.pallas.fused_matmul`` — matmul + bias + activation fused in the MXU
epilogue, no HBM round-trip between them — with a semantics-identical jnp
fallback otherwise (north star: "Pallas-fused conv/activation blocks";
BASELINE.json).

Default (``use_pallas=None``) is the XLA path: measured on the v5e, XLA
wins these model-side matmuls at production shapes (skinny batch-sized FC
heads, narrow 1×1 branches — BASELINE.md decision matrix), while the
Pallas kernel wins large-M×large-N problems (96 vs 69 TF/s at
16384×4096×1024). Unlike the NMS/matching kernels, auto does NOT turn
this on — set ``use_pallas=True`` deliberately for large-shape configs.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from multibox_tpu.ops.pallas.fused_matmul import fused_matmul_bias_relu


class FusedDense(nn.Module):
    """``nn.Dense`` (+ optional fused ReLU) with a Pallas fast path."""

    features: int
    relu: bool = False
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if self.use_pallas:  # None/False -> XLA (see module docstring)
            return fused_matmul_bias_relu(x, k, bias, self.relu)
        y = x @ k + bias.astype(self.dtype)
        return jnp.maximum(y, 0.0) if self.relu else y


class FusedConv1x1(nn.Module):
    """1×1 stride-1 ``nn.Conv`` (+ optional fused ReLU) with a Pallas fast
    path — on TPU a 1×1 conv IS a matmul over ``[B·H·W, Cin]``."""

    features: int
    use_bias: bool = True
    relu: bool = False
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.initializers.zeros_init(),
                (self.features,),
                jnp.float32,
            )
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.reshape(cin, self.features).astype(self.dtype)
        B, H, W, _ = x.shape
        if self.use_pallas:  # None/False -> XLA (see module docstring)
            y = fused_matmul_bias_relu(
                x.reshape(B * H * W, cin), k, bias, self.relu
            )
            return y.reshape(B, H, W, self.features)
        y = x.reshape(B * H * W, cin) @ k + bias.astype(self.dtype)
        if self.relu:
            y = jnp.maximum(y, 0.0)
        return y.reshape(B, H, W, self.features)
