"""Int8 PTQ preparation: EMA-select → fold BN → quantize → calibrate.

The user-facing entry point for the int8 detect path (``cfg.quantize =
"int8"``). Produces the prepared variable tree that
``inference.make_detect_body`` applies directly:

    variables_q = prepare_quantized_variables(cfg, variables, calib_batches)
    results = run_detect_loop(cfg, variables_q, dataset, priors)

The detect/eval CLIs do this automatically, calibrating on the first
``cfg.quant_calib_batches`` batches of their own input (then re-iterating
the dataset for the real run).

See ``models/quant.py`` for the quantization scheme itself. There is no
reference analogue (the reference's TF-1.x CPU stack had no int8 path);
this is a TPU-native extension exploiting the v5e MXU's 2× int8 rate.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from multibox_tpu.config import Config
from multibox_tpu.models.inception_v3 import fold_batch_norms
from multibox_tpu.models.quant import quantize_variables


def prepare_quantized_variables(
    cfg: Config,
    variables,
    calib_images: Iterable[np.ndarray],
    use_ema: bool = None,
):
    """Bake a trained checkpoint into calibrated int8 detect variables.

    Args:
      variables: live train/detect variables (``params`` [+ ``ema``,
        ``batch_stats``]) as returned by ``TrainState.detect_variables``.
      calib_images: iterable of uint8 image batches ``[B, S, S, 3]`` (the
        detect input format — preprocessing runs on device here exactly as
        it does in the detect loop, so calibration sees the true activation
        distributions).
      use_ema: default ``cfg.use_ema_for_detect`` — the EMA choice is baked
        in here (the quantized tree has no shadow params).

    Returns ``{"params", "quant"}`` for the ``quantize="int8"`` model.
    """
    from multibox_tpu.data.augment import preprocess_eval
    from multibox_tpu.inference import build_model

    if use_ema is None:
        use_ema = cfg.use_ema_for_detect
    params = variables["params"]
    if use_ema and "ema" in variables:
        params = variables["ema"]
    folded = fold_batch_norms(
        {"params": params, "batch_stats": variables.get("batch_stats", {})}
    )
    scope = {"inception_v3": "InceptionV3", "mobilenet_v2": "MobileNetV2"}[
        cfg.backbone
    ]
    vq = quantize_variables(folded, backbone_scope=scope)

    calib_model = build_model(
        cfg, cfg.num_priors, folded=True, quantize="calib"
    )

    @jax.jit
    def calib_step(quant, images):
        imgs = preprocess_eval(images, cfg.input_size)
        _, updated = calib_model.apply(
            {"params": vq["params"], "quant": quant},
            imgs,
            train=False,
            mutable=["quant"],
        )
        return updated["quant"]

    quant = vq["quant"]
    n = 0
    for images in calib_images:
        quant = calib_step(quant, jnp.asarray(images))
        n += 1
    if n == 0:
        raise ValueError(
            "int8 calibration needs at least one image batch "
            "(got an empty calib_images iterable)"
        )
    return {"params": vq["params"], "quant": jax.device_get(quant)}


def calib_batches_from_dataset(dataset, num_batches: int):
    """First ``num_batches`` image arrays from a ``DetectionDataset``-style
    iterable (each item a dict with an ``images`` uint8 array)."""
    out = []
    for batch in dataset:
        out.append(np.asarray(batch["images"]))
        if len(out) >= num_batches:
            break
    return out
