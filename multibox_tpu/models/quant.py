"""Post-training int8 quantization for the BN-folded backbone.

TPU v5e's MXU runs int8×int8→int32 at 2× its bf16 rate (394 vs 197
TOPS/TFLOPS peak), and the detect pipeline is entirely backbone-conv-bound
(BASELINE.md stage breakdown: head/decode/NMS overlap into the backbone for
free). Quantizing the 94 folded conv units is therefore the one remaining
lever on detect throughput that does not change the model family.

Scheme (standard PTQ, no reference analogue — the reference's TF-1.x stack
had no TPU int8 path; this is a TPU-native extension):

* **Weights**: symmetric per-output-channel int8. ``w = kernel_q · w_scale``
  with ``w_scale[cout] = max|w[..., cout]| / 127`` — per-channel scales are
  free (they fold into the conv epilogue) and remove the cross-channel
  dynamic-range coupling that per-tensor weight scales suffer.
* **Activations**: symmetric per-tensor scales calibrated as a running
  abs-max over calibration batches (``quantize="calib"`` model variant
  collects them into the mutable ``quant`` collection; the running max
  makes calibration batch-order-invariant).
* **Compute**: ``conv(int8, int8) → int32`` via
  ``preferred_element_type=jnp.int32`` (MXU-native), dequantized in the
  epilogue as ``y·(x_scale/127)·w_scale + bias`` and re-emitted in
  ``compute_dtype`` so inter-layer traffic stays bf16-sized.

Only the backbone quantizes: the detection heads are deliberately f32
(measured: bf16 heads stall confidence training; they are ~0% of detect
time per the stage breakdown) and stay untouched.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class QuantConv(nn.Module):
    """Int8 conv + bias, param-tree shaped like a folded ``nn.Conv`` unit.

    Parameters: ``kernel_q`` (int8 ``[kh, kw, cin, cout]``), ``w_scale``
    (f32 ``[cout]``, dequant multiplier), ``bias`` (f32 ``[cout]``) — built
    from a folded checkpoint by :func:`quantize_conv_params`, never trained.
    The activation scale lives in the mutable ``quant`` collection so the
    calibration pass can update it (flax params are read-only in apply).

    ``calibrate=True`` runs the conv in ``compute_dtype`` with dequantized
    weights (so downstream layers see realistic activations) while folding
    ``max|x|`` into ``quant/x_scale``.
    """

    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    groups: int = 1  # feature_group_count (mobilenet depthwise: groups=cin)
    calibrate: bool = False
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = tuple(self.kernel)
        cin = x.shape[-1] // self.groups
        kernel_q = self.param(
            "kernel_q",
            nn.initializers.zeros_init(),
            (kh, kw, cin, self.features),
            jnp.int8,
        )
        w_scale = self.param(
            "w_scale",
            nn.initializers.ones_init(),
            (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        x_scale = self.variable(
            "quant", "x_scale", lambda: jnp.zeros((), jnp.float32)
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC")
        )
        strides = tuple(self.strides)

        if self.calibrate:
            if not self.is_initializing():
                amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
                x_scale.value = jnp.maximum(x_scale.value, amax)
            w = kernel_q.astype(self.compute_dtype) * w_scale.astype(
                self.compute_dtype
            )
            y = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype),
                w,
                strides,
                self.padding,
                dimension_numbers=dn,
                feature_group_count=self.groups,
                preferred_element_type=jnp.float32,
            )
            return (y + bias).astype(self.compute_dtype)

        # Inference: requantize the activation, int8 conv on the MXU,
        # dequantize + bias in the epilogue (XLA fuses the elementwise
        # pre/post ops into the conv's producers/consumers).
        scale = jnp.where(x_scale.value > 0, x_scale.value, 1.0)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (127.0 / scale)), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            kernel_q,
            strides,
            self.padding,
            dimension_numbers=dn,
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * ((scale / 127.0) * w_scale) + bias
        return y.astype(self.compute_dtype)


def quantize_conv_params(kernel: np.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns ``(kernel_q int8, w_scale f32[cout])`` with
    ``kernel ≈ kernel_q · w_scale``.
    """
    w = np.asarray(kernel, np.float32)
    absmax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)
    w_scale = (absmax / 127.0).astype(np.float32)
    kernel_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
    return kernel_q, w_scale


def quantize_variables(folded_variables, backbone_scope: str = "InceptionV3"):
    """Transform BN-folded f32 variables into the int8 model's tree.

    Every ``<backbone_scope>/**/Conv/kernel`` becomes ``kernel_q`` +
    ``w_scale`` (bias passes through), with a zero-initialized
    ``quant/**/Conv/x_scale`` awaiting calibration. Head parameters (and
    anything outside the backbone scope) pass through untouched — heads
    stay f32 by design (module docstring).
    """
    flat = flax.traverse_util.flatten_dict(folded_variables["params"])
    out, quant = {}, {}
    for key, val in flat.items():
        if key[0] == backbone_scope and key[-2:] == ("Conv", "kernel"):
            kernel_q, w_scale = quantize_conv_params(val)
            out[key[:-1] + ("kernel_q",)] = jnp.asarray(kernel_q)
            out[key[:-1] + ("w_scale",)] = jnp.asarray(w_scale)
            quant[key[:-1] + ("x_scale",)] = jnp.zeros((), jnp.float32)
        else:
            out[key] = val
    return {
        "params": flax.traverse_util.unflatten_dict(out),
        "quant": flax.traverse_util.unflatten_dict(quant),
    }
