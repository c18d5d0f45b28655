"""TensorFlow checkpoint → flax parameter import.

The reference restores an ImageNet-pretrained tf-slim Inception-v3
checkpoint into its backbone, excluding the detection-head scopes, and at
inference restores the ExponentialMovingAverage shadow variables
(SURVEY.md §2 C4, §5.4). This module reproduces both behaviors for the
flax backbone:

* :func:`import_slim_checkpoint` — name-mapped import from a tf-slim
  ``InceptionV3/...`` checkpoint (``tf.train.load_checkpoint``), optionally
  reading the EMA shadow variables (``.../ExponentialMovingAverage``).
* :func:`import_keras_inception_v3` — order-based import from
  ``tf.keras.applications.InceptionV3``; keras builds its Conv/BN layers in
  the same topological order our flax module creates parameters, so pairing
  them in order is exact. Used by the offline golden parity test (no
  network → no pretrained slim ckpt in CI; keras random weights suffice to
  validate architecture equivalence bit-for-bit-ish).

Conventions translated:
  TF conv kernel  [kh, kw, cin, cout] — identical layout in flax ``Conv``.
  slim BN: ``beta`` → ``params/.../BatchNorm/bias``;
  ``moving_mean``/``moving_variance`` → ``batch_stats/.../BatchNorm/{mean,var}``.

slim naming quirk handled: ``Mixed_5c/Branch_1`` uses ``Conv2d_0b_1x1`` and
``Conv_1_0c_5x5`` where every other 35×35 block uses ``0a_1x1``/``0b_5x5``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import flax
import jax.numpy as jnp

# flax param path pieces (this module's canonical ordering of conv units,
# mirroring construction order in inception_v3.py).
_STEM = [
    "Conv2d_1a_3x3",
    "Conv2d_2a_3x3",
    "Conv2d_2b_3x3",
    "Conv2d_3b_1x1",
    "Conv2d_4a_3x3",
]

_BLOCK_UNITS = {
    "InceptionA": [
        "Branch_0/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0b_5x5",
        "Branch_2/Conv2d_0a_1x1",
        "Branch_2/Conv2d_0b_3x3",
        "Branch_2/Conv2d_0c_3x3",
        "Branch_3/Conv2d_0b_1x1",
    ],
    "ReductionA": [
        "Branch_0/Conv2d_1a_1x1",
        "Branch_1/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0b_3x3",
        "Branch_1/Conv2d_1a_1x1",
    ],
    "InceptionB": [
        "Branch_0/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0b_1x7",
        "Branch_1/Conv2d_0c_7x1",
        "Branch_2/Conv2d_0a_1x1",
        "Branch_2/Conv2d_0b_7x1",
        "Branch_2/Conv2d_0c_1x7",
        "Branch_2/Conv2d_0d_7x1",
        "Branch_2/Conv2d_0e_1x7",
        "Branch_3/Conv2d_0b_1x1",
    ],
    "ReductionB": [
        "Branch_0/Conv2d_0a_1x1",
        "Branch_0/Conv2d_1a_3x3",
        "Branch_1/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0b_1x7",
        "Branch_1/Conv2d_0c_7x1",
        "Branch_1/Conv2d_1a_3x3",
    ],
    "InceptionC": [
        "Branch_0/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0a_1x1",
        "Branch_1/Conv2d_0b_1x3",
        "Branch_1/Conv2d_0b_3x1",
        "Branch_2/Conv2d_0a_1x1",
        "Branch_2/Conv2d_0b_3x3",
        "Branch_2/Conv2d_0c_1x3",
        "Branch_2/Conv2d_0d_3x1",
        "Branch_3/Conv2d_0b_1x1",
    ],
}

_BLOCKS = [
    ("Mixed_5b", "InceptionA"),
    ("Mixed_5c", "InceptionA"),
    ("Mixed_5d", "InceptionA"),
    ("Mixed_6a", "ReductionA"),
    ("Mixed_6b", "InceptionB"),
    ("Mixed_6c", "InceptionB"),
    ("Mixed_6d", "InceptionB"),
    ("Mixed_6e", "InceptionB"),
    ("Mixed_7a", "ReductionB"),
    ("Mixed_7b", "InceptionC"),
    ("Mixed_7c", "InceptionC"),
]


def conv_unit_order() -> list:
    """All ConvBN unit paths in construction order (94 units)."""
    units = list(_STEM)
    for block, kind in _BLOCKS:
        units += [f"{block}/{u}" for u in _BLOCK_UNITS[kind]]
    return units


def _unit_path(prefix: tuple, unit: str) -> tuple:
    """flax tree path for a conv unit.

    Module names contain "/" (e.g. "Branch_0/Conv2d_0a_1x1" is ONE module
    name); tree keys must therefore be tuples, never "/"-joined strings.
    """
    parts = unit.split("/")
    if len(parts) == 1:
        return prefix + (parts[0],)
    return prefix + (parts[0], "/".join(parts[1:]))


def _slim_name(unit: str) -> str:
    """Our unit path → the slim variable scope for that conv unit."""
    # slim quirk: Mixed_5c/Branch_1 names.
    if unit == "Mixed_5c/Branch_1/Conv2d_0a_1x1":
        return "Mixed_5c/Branch_1/Conv2d_0b_1x1"
    if unit == "Mixed_5c/Branch_1/Conv2d_0b_5x5":
        return "Mixed_5c/Branch_1/Conv_1_0c_5x5"
    # slim quirk: Mixed_7c/Branch_1 names its 3x1 conv 0c (Mixed_7b uses 0b).
    if unit == "Mixed_7c/Branch_1/Conv2d_0b_3x1":
        return "Mixed_7c/Branch_1/Conv2d_0c_3x1"
    return unit


def import_slim_checkpoint(
    ckpt_path: str,
    variables: Dict[str, Any],
    backbone_scope: str = "InceptionV3",
    use_ema: bool = False,
) -> Dict[str, Any]:
    """Load a tf-slim InceptionV3 checkpoint into flax variables.

    Args:
      ckpt_path: path to the TF checkpoint (prefix).
      variables: flax variables dict ``{"params": ..., "batch_stats": ...}``
        from ``MultiBoxDetector.init`` (head params left untouched —
        reference behavior: restore backbone, fresh head).
      backbone_scope: the slim scope prefix in the checkpoint.
      use_ema: read ``<var>/ExponentialMovingAverage`` shadows instead of
        the raw variables (the reference's inference-time restore).

    Returns a new variables dict.
    """
    import tensorflow as tf  # local import: TF is host-side tooling only

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()

    def read(name):
        if use_ema and f"{name}/ExponentialMovingAverage" in shape_map:
            return reader.get_tensor(f"{name}/ExponentialMovingAverage")
        if name not in shape_map:
            raise KeyError(f"variable {name} not found in checkpoint {ckpt_path}")
        return reader.get_tensor(name)

    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables.get("batch_stats", {}))
    prefix = _backbone_prefix(params)

    for unit in conv_unit_order():
        slim = f"{backbone_scope}/{_slim_name(unit)}"
        path = _unit_path(prefix, unit)
        params[path + ("Conv", "kernel")] = _check_assign(
            params[path + ("Conv", "kernel")], read(f"{slim}/weights")
        )
        params[path + ("BatchNorm", "bias")] = _check_assign(
            params[path + ("BatchNorm", "bias")], read(f"{slim}/BatchNorm/beta")
        )
        stats[path + ("BatchNorm", "mean")] = _check_assign(
            stats[path + ("BatchNorm", "mean")], read(f"{slim}/BatchNorm/moving_mean")
        )
        stats[path + ("BatchNorm", "var")] = _check_assign(
            stats[path + ("BatchNorm", "var")],
            read(f"{slim}/BatchNorm/moving_variance"),
        )

    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(params)
    out["batch_stats"] = flax.traverse_util.unflatten_dict(stats)
    return out


def import_keras_inception_v3(
    keras_model, variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Copy weights from ``tf.keras.applications.InceptionV3`` (include_top
    irrelevant) into the flax backbone, pairing Conv/BN layers in
    construction order (identical topological order on both sides).
    """
    convs, bns = [], []
    for layer in keras_model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            convs.append(layer)
        elif cls == "BatchNormalization":
            bns.append(layer)

    # model.layers is topologically sorted (parallel branches interleave);
    # keras auto-names carry the creation counter ("conv2d", "conv2d_1", …)
    # which matches source construction order — sort on it.
    def creation_index(layer):
        suffix = layer.name.rsplit("_", 1)[-1]
        return int(suffix) if suffix.isdigit() else 0

    convs.sort(key=creation_index)
    bns.sort(key=creation_index)
    units = conv_unit_order()
    if len(convs) < len(units):
        raise ValueError(
            f"keras model has {len(convs)} convs; expected >= {len(units)}"
        )

    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables.get("batch_stats", {}))
    prefix = _backbone_prefix(params)

    for unit, conv, bn in zip(units, convs, bns):
        path = _unit_path(prefix, unit)
        kernel = conv.get_weights()[0]
        beta, moving_mean, moving_var = bn.get_weights()
        params[path + ("Conv", "kernel")] = _check_assign(
            params[path + ("Conv", "kernel")], kernel
        )
        params[path + ("BatchNorm", "bias")] = _check_assign(
            params[path + ("BatchNorm", "bias")], beta
        )
        stats[path + ("BatchNorm", "mean")] = _check_assign(
            stats[path + ("BatchNorm", "mean")], moving_mean
        )
        stats[path + ("BatchNorm", "var")] = _check_assign(
            stats[path + ("BatchNorm", "var")], moving_var
        )

    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(params)
    out["batch_stats"] = flax.traverse_util.unflatten_dict(stats)
    return out


def _backbone_prefix(flat_params: Dict[Tuple, Any]) -> tuple:
    """("InceptionV3",) when importing into a full detector, () for a bare
    backbone (paths then start directly with Conv2d_1a_3x3)."""
    for key in flat_params:
        if key and key[0] == "InceptionV3":
            return ("InceptionV3",)
    return ()


def _check_assign(old, new) -> jnp.ndarray:
    new = np.asarray(new)
    if tuple(old.shape) != tuple(new.shape):
        raise ValueError(f"shape mismatch: flax {old.shape} vs tf {new.shape}")
    return jnp.asarray(new, dtype=old.dtype)
