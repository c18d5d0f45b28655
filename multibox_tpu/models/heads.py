"""MultiBox detection heads.

Two head families, covering the reference's head (SURVEY.md §2 C5) and the
SSD-style multi-scale extension (BASELINE.json configs[3]):

* :class:`MultiBoxHead` — the DeepMultiBox head (Erhan et al., CVPR'14;
  Szegedy et al., arXiv:1412.1441): from the final feature map, a 1×1-conv
  bottleneck + fully-connected layers emit ``locations [B, P, 4]`` (linear,
  residual offsets w.r.t. the P clustered priors) and
  ``confidences [B, P]`` (logits). P is the number of *clustered* priors —
  predictions are tied to priors by index, not by spatial cell.
* :class:`SSDHead` — per-endpoint 3×3 conv heads over multiple feature-map
  resolutions (Liu et al., arXiv:1512.02325). Priors must be grid priors
  from ``priors.generate_priors_multiscale`` with matching feature-map
  sizes and priors-per-cell; output ordering is level → row → col → shape,
  identical to the prior generator's.

Both emit ``(locations [B, P, 4], confidences [B, P] or [B, P, C])``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multibox_tpu.models.layers import FusedConv1x1, FusedDense


class MultiBoxHead(nn.Module):
    """FC MultiBox head over the final endpoint (default ``Mixed_7c``).

    All three layers route through the fused Pallas matmul kernel
    (``ops.pallas.fused_matmul``) when ``use_pallas`` resolves true; the
    parameter tree is identical either way (``FusedDense``/``FusedConv1x1``
    are param-compatible with ``nn.Dense``/``nn.Conv``).
    """

    num_priors: int
    num_classes: int = 1  # 1 → class-agnostic confidence [B, P]
    bottleneck_features: int = 96
    endpoint: str = "Mixed_7c"
    compute_dtype: Any = jnp.bfloat16
    use_pallas: Optional[bool] = None  # None = auto (TPU only)

    @nn.compact
    def __call__(self, endpoints: Dict[str, jnp.ndarray], train: bool = False):
        # Head computes in float32 even under a bf16 backbone: bf16 logits
        # stall confidence training (measured — conf BCE plateaus at ~2.4 vs
        # converging to ~0.03 in f32), while the head is a negligible
        # fraction of the FLOPs. Standard mixed-precision practice.
        x = endpoints[self.endpoint].astype(jnp.float32)
        B = x.shape[0]

        # Shared 1×1 bottleneck keeps the FC input tractable
        # (8·8·2048 → 8·8·96 ≈ 6k features). ReLU fused into the matmul
        # epilogue on the Pallas path.
        x = FusedConv1x1(
            self.bottleneck_features, use_bias=True, relu=True,
            use_pallas=self.use_pallas, dtype=jnp.float32, name="Bottleneck",
        )(x)
        x = x.reshape(B, -1)

        loc = FusedDense(
            self.num_priors * 4, use_pallas=self.use_pallas,
            dtype=jnp.float32, name="Locations",
        )(x)
        loc = loc.reshape(B, self.num_priors, 4)

        conf = FusedDense(
            self.num_priors * self.num_classes,
            use_pallas=self.use_pallas,
            dtype=jnp.float32,
            name="Confidences",
        )(x)
        if self.num_classes == 1:
            conf = conf.reshape(B, self.num_priors)
        else:
            conf = conf.reshape(B, self.num_priors, self.num_classes)
        return loc, conf


class SSDHead(nn.Module):
    """Multi-scale conv head: one (loc, conf) 3×3 conv pair per endpoint."""

    endpoints_spec: Sequence[str] = ("Mixed_5d", "Mixed_6e", "Mixed_7c")
    priors_per_cell: int = 6
    num_classes: int = 1
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, endpoints: Dict[str, jnp.ndarray], train: bool = False):
        locs, confs = [], []
        K, C = self.priors_per_cell, self.num_classes
        for name in self.endpoints_spec:
            # f32 head over bf16 backbone features (see MultiBoxHead note).
            x = endpoints[name].astype(jnp.float32)
            B, H, W, _ = x.shape
            loc = nn.Conv(
                K * 4, (3, 3), use_bias=True, dtype=jnp.float32,
                name=f"Loc_{name}",
            )(x)
            conf = nn.Conv(
                K * C, (3, 3), use_bias=True, dtype=jnp.float32,
                name=f"Conf_{name}",
            )(x)
            # Row-major (row, col, shape) flattening — matches
            # priors.generate_priors_multiscale ordering.
            locs.append(loc.reshape(B, H * W * K, 4))
            confs.append(conf.reshape(B, H * W * K, C))
        loc = jnp.concatenate(locs, axis=1)
        conf = jnp.concatenate(confs, axis=1)
        if C == 1:
            conf = conf.squeeze(-1)
        return loc, conf
