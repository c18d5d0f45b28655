"""Measure the train step across batch sizes / remat / grad accumulation.

Pins the large-batch training rows in BASELINE.md with the same
slope-based chained timing bench.py uses (the relay memoizes
byte-identical executions and charges a drifting fixed cost per
execution — see CLAUDE.md):

* batch 256 plain (does MFU keep climbing past b128's 35.8 %?)
* batch 128 remat vs plain (pin cfg.remat's real recompute overhead —
  the config comment shipped with an unmeasured "~30%" estimate)
* batch 256 grad_accum_steps=2 vs plain (what accumulation costs when
  you DON'T need it; its value is the activation-memory headroom)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_batch_sweep.py \
      [--arms b128 b128_remat b256 ...] [--iters 8]

Prints one JSON line per arm: {"arm": ..., "ms_per_step": ..., "img_s":
..., "tflops": ..., "mfu": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PEAK_TFLOPS, _marginal_step_time  # noqa: E402 (repo root)


ARMS = {
    # name: (batch, overrides)
    "b32": (32, {}),
    "b128": (128, {}),
    "b128_remat": (128, {"remat": True}),
    "b256": (256, {}),
    "b256_remat": (256, {"remat": True}),
    "b256_accum2": (256, {"grad_accum_steps": 2}),
    "b512_remat_accum2": (512, {"remat": True, "grad_accum_steps": 2}),
}


def bench_arm(name: str, iters: int, priors_count: int = 256,
              canvas: int = 343):
    import jax
    import jax.numpy as jnp

    from multibox_tpu.config import Config
    from multibox_tpu.inference import build_model
    from multibox_tpu.train.loop import make_augmented_train_step
    from multibox_tpu.train.state import create_train_state
    from multibox_tpu.utils.transfer import fast_device_put

    batch, overrides = ARMS[name]
    cfg = Config(num_priors=priors_count, batch_size=batch, **overrides)
    rng = np.random.default_rng(0)
    priors = jnp.asarray(
        np.sort(rng.uniform(0, 1, (priors_count, 2, 2)).astype(np.float32),
                axis=1).reshape(priors_count, 4))
    model = build_model(cfg, priors_count)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), priors_count)
    step = make_augmented_train_step(cfg, model, priors)

    G = cfg.max_num_bboxes
    batch_np = {
        "images": rng.integers(0, 255, (batch, canvas, canvas, 3)).astype(np.uint8),
        "boxes": np.sort(rng.uniform(0.1, 0.9, (batch, G, 2, 2)).astype(np.float32),
                         axis=2).reshape(batch, G, 4),
        "num_boxes": np.full((batch,), 4, np.int32),
    }

    def chained(state, b, n):
        def body(i, carry):
            state, _ = carry
            state, metrics = step(state, b)
            return state, metrics["loss"]

        state, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        leaf = jax.tree.leaves(state.params)[0]
        return loss + jnp.sum(leaf.astype(jnp.float32)) * 1e-12

    dev_batch = fast_device_put(batch_np, jax.devices()[0])
    f = jax.jit(chained, static_argnums=2)

    def run(k, n):
        b2 = dict(batch_np)
        # nonzero uint8 mask; k may exceed 255 (estimator warmup reps)
        b2["images"] = batch_np["images"] ^ np.uint8((k % 255) + 1)
        db2 = fast_device_put(b2, jax.devices()[0])
        float(f(state, db2, n))

    per = _marginal_step_time(run, iters)

    flops = None
    try:
        comp = jax.jit(step).lower(state, dev_batch).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"# cost_analysis unavailable for {name}: {e}", file=sys.stderr)
    tflops = (flops / per / 1e12) if flops else None
    row = {
        "arm": name,
        "batch": batch,
        "ms_per_step": round(per * 1e3, 2),
        "img_s": round(batch / per, 1),
        "tflops": round(tflops, 1) if tflops else None,
        "mfu": round(tflops / PEAK_TFLOPS, 3) if tflops else None,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+", default=["b128", "b128_remat",
                                                  "b256", "b256_accum2"])
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from multibox_tpu.cli.common import setup_jax_cache

    setup_jax_cache()
    import jax

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    for arm in args.arms:
        try:
            bench_arm(arm, iters=args.iters)
        except Exception as e:
            print(json.dumps({"arm": arm, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
