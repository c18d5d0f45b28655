"""multibox-train — training CLI (flag surface of ref:train.py)."""

from __future__ import annotations

import argparse

from multibox_tpu import priors as priors_mod
from multibox_tpu.cli.common import (
    add_config_arg,
    expand_tfrecords,
    load_config,
    setup_logging,
)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tfrecords", nargs="+", required=True,
                        help="tfrecord files or globs")
    parser.add_argument("--priors", required=True, help="priors pickle path")
    parser.add_argument("--logdir", required=True,
                        help="checkpoints + tensorboard events (resumes if present)")
    parser.add_argument("--pretrained_model", default=None,
                        help="slim ckpt prefix or keras .h5 to warm-start the backbone")
    parser.add_argument("--max_number_of_steps", type=int, default=None)
    parser.add_argument("--eval_tfrecords", nargs="+", default=None,
                        help="validation tfrecords for periodic AP eval")
    parser.add_argument("--eval_every_steps", type=int, default=1000)
    parser.add_argument("--no_mesh", action="store_true",
                        help="force single-device even with multiple devices visible")
    add_config_arg(parser)
    args = parser.parse_args(argv)
    setup_logging()

    cfg = load_config(args)
    priors = priors_mod.load_priors(args.priors)
    cfg.num_priors = priors.shape[0]

    from multibox_tpu.train.loop import train

    train(
        cfg,
        expand_tfrecords(args.tfrecords),
        priors,
        args.logdir,
        pretrained_model=args.pretrained_model,
        max_steps=args.max_number_of_steps,
        use_mesh=not args.no_mesh,
        eval_tfrecords=(
            expand_tfrecords(args.eval_tfrecords) if args.eval_tfrecords else None
        ),
        eval_every_steps=args.eval_every_steps,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
