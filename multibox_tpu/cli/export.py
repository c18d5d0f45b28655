"""multibox-export — export the inference graph for deployment.

ref:export.py equivalent (SURVEY.md §2 C13). The reference froze a TF
GraphDef with EMA weights folded in; the TPU-native analog exports the
jitted detect function (EMA params baked in) as:

- StableHLO (``jax.export``) — portable, runtime-loadable artifact
- params .npz — the frozen weights
- optionally a TF SavedModel via jax2tf when --saved_model is given
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from multibox_tpu import priors as priors_mod
from multibox_tpu.cli.common import add_config_arg, load_config, setup_logging


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--priors", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--batch_sizes", type=int, nargs="+", default=None,
                        help="export one program per batch size (static "
                             "shapes); serving.load_exported dispatches "
                             "each request to the best-fitting size and "
                             "pads only the remainder")
    parser.add_argument("--saved_model", action="store_true",
                        help="also write a TF SavedModel via jax2tf")
    parser.add_argument("--fold_bn", action="store_true",
                        help="fold BatchNorm into conv weights (fewer ops "
                             "in the exported graph; ~1e-4 output delta)")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="export the int8 PTQ detect program (folds BN, "
                             "per-channel int8 backbone convs; measured "
                             "1.4x detect on v5e — BASELINE.md); requires "
                             "--calib_tfrecords for activation calibration")
    parser.add_argument("--calib_tfrecords", nargs="+", default=None,
                        help="tfrecords supplying quant_calib_batches "
                             "calibration batches for --quantize")
    add_config_arg(parser)
    args = parser.parse_args(argv)
    setup_logging()

    cfg = load_config(args)
    priors = priors_mod.load_priors(args.priors)
    cfg.num_priors = priors.shape[0]

    from multibox_tpu.inference import apply_and_postprocess, build_model
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.checkpoint import CheckpointManager

    model = build_model(cfg, priors.shape[0])
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), priors.shape[0])
    ckpt = CheckpointManager(args.checkpoint_path)
    state = ckpt.restore(state)
    ckpt.close()

    # Freeze: EMA params folded in (reference behavior), constants captured.
    variables = {
        "params": state.ema_params if cfg.use_ema_for_detect else state.params,
        "batch_stats": state.batch_stats,
    }
    if args.quantize:
        # int8 PTQ export: EMA selection + BN folding + weight quantization
        # + activation calibration baked into the exported program.
        if args.fold_bn:
            raise SystemExit(
                "--quantize already folds BN; drop --fold_bn"
            )
        if not args.calib_tfrecords:
            raise SystemExit(
                "--quantize needs --calib_tfrecords (activation scales are "
                "calibrated on real data)"
            )
        from multibox_tpu.cli.common import expand_tfrecords
        from multibox_tpu.data.pipeline import DetectionDataset
        from multibox_tpu.quantize import (
            calib_batches_from_dataset,
            prepare_quantized_variables,
        )

        cfg.quantize = args.quantize
        calib_ds = DetectionDataset(
            expand_tfrecords(args.calib_tfrecords),
            batch_size=cfg.batch_size,
            canvas_size=cfg.input_size,
            max_num_bboxes=cfg.max_num_bboxes,
        )
        variables = prepare_quantized_variables(
            cfg,
            dict(variables, ema=state.ema_params),
            calib_batches_from_dataset(calib_ds, cfg.quant_calib_batches),
        )
        model = build_model(cfg, priors.shape[0], folded=True, quantize="int8")
    elif args.fold_bn:
        # fold_batch_norms handles both backbone conventions (inception's
        # scale-less slim BN and mobilenet's scale-ful BN).
        from multibox_tpu.models.inception_v3 import fold_batch_norms

        variables = fold_batch_norms(variables)
        model = build_model(cfg, priors.shape[0], folded=True)
    variables = jax.tree.map(np.asarray, variables)
    priors_j = jnp.asarray(priors)

    def frozen_detect(images):
        # Shared with the live detect path — cfg.flip_tta and the
        # postprocess semantics are honored identically in the export.
        return apply_and_postprocess(model, variables, images, priors_j, cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    sizes = sorted(set(args.batch_sizes or [args.batch_size]))
    # Re-exports must not leave stale siblings from an earlier checkpoint:
    # the serving loader globs detect_b*.stablehlo.bin, and a leftover
    # would silently serve old weights for that batch size.
    import glob as globmod

    for stale in globmod.glob(
        os.path.join(args.output_dir, "detect_b*.stablehlo.bin")
    ):
        os.remove(stale)
    example = jnp.zeros(
        (sizes[0], cfg.input_size, cfg.input_size, 3), jnp.float32
    )

    from jax import export as jax_export

    for i, bs in enumerate(sizes):
        exported = jax_export.export(jax.jit(frozen_detect))(
            jax.ShapeDtypeStruct(
                (bs, cfg.input_size, cfg.input_size, 3), jnp.float32
            )
        )
        # The smallest size keeps the historical primary filename (older
        # loaders read only that); extra sizes are detect_b{N} siblings.
        name = (
            "detect.stablehlo.bin" if i == 0 else f"detect_b{bs}.stablehlo.bin"
        )
        with open(os.path.join(args.output_dir, name), "wb") as f:
            f.write(exported.serialize())
        if i == 0:
            with open(os.path.join(args.output_dir, "detect.mlir.txt"), "w") as f:
                f.write(str(exported.mlir_module()))

    flat = {}
    import flax

    for k, v in flax.traverse_util.flatten_dict(variables).items():
        flat["/".join(map(str, k))] = np.asarray(v)
    np.savez(os.path.join(args.output_dir, "params.npz"), **flat)
    priors_mod.save_priors(priors, os.path.join(args.output_dir, "priors.pkl"))
    with open(os.path.join(args.output_dir, "config.pkl"), "wb") as f:
        pickle.dump(cfg, f)

    if args.saved_model:
        # One SavedModel per requested batch size (TF signatures are
        # static too): the smallest keeps the historical saved_model/
        # path, extras land in saved_model_b{N}/.
        for i, bs in enumerate(sizes):
            ex = jnp.zeros(
                (bs, cfg.input_size, cfg.input_size, 3), jnp.float32
            )
            sub = "saved_model" if i == 0 else f"saved_model_b{bs}"
            _export_saved_model(frozen_detect, ex, args.output_dir, sub)

    print(f"exported to {args.output_dir}")
    return 0


def _export_saved_model(fn, example, output_dir, subdir="saved_model"):
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec(example.shape, tf.float32)],
        autograph=False,
    )
    module = tf.Module()
    module.detect = tf_fn
    tf.saved_model.save(module, os.path.join(output_dir, subdir))


if __name__ == "__main__":
    raise SystemExit(main())
