"""Train state + jitted train step.

Optimizer parity with the reference (SURVEY.md §2 C8): RMSProp
(decay/epsilon/momentum from config) with exponentially-decayed learning
rate, plus parameter ExponentialMovingAverage shadows
(``MOVING_AVERAGE_DECAY`` ≈ 0.9999) which inference restores — the subtle
reference behavior called out in SURVEY.md §5.4.

The train step is one pure function: images + padded gt boxes in, new state
+ metrics out. Matching, loss, backprop, optimizer update, BN-stat update
and EMA update all happen inside the single jitted XLA program. For
multi-chip, the same step is jitted over a mesh with the batch sharded on
the data axis (``multibox_tpu.parallel``) — gradients all-reduce over ICI
automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from multibox_tpu.config import Config
from multibox_tpu.train.loss import multibox_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # EMA shadows of params (restored at inference)

    def detect_variables(self) -> Dict[str, Any]:
        """Variables dict for ``make_detect_fn`` (incl. EMA collection)."""
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "ema": self.ema_params,
        }


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    """LR schedule: slim-style staircase exponential decay (reference
    parity) or cosine; optional floor + linear warmup (cfg.lr_schedule,
    cfg.min_learning_rate, cfg.warmup_steps — the staircase otherwise
    decays to useless magnitudes on long runs, the measured cause of the
    round-2 multi-class conf plateau)."""
    if cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            init_value=cfg.initial_learning_rate,
            decay_steps=max(cfg.max_number_of_steps - cfg.warmup_steps, 1),
            alpha=(
                cfg.min_learning_rate / cfg.initial_learning_rate
                if cfg.initial_learning_rate
                else 0.0
            ),
        )
    elif cfg.lr_schedule == "exponential":
        decay_steps = max(
            int(cfg.num_epochs_per_decay * cfg.num_train_examples / cfg.batch_size),
            1,
        )
        sched = optax.exponential_decay(
            init_value=cfg.initial_learning_rate,
            transition_steps=decay_steps,
            decay_rate=cfg.learning_rate_decay_factor,
            staircase=True,
            end_value=cfg.min_learning_rate or None,
        )
    else:
        raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule!r}")
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(
            init_value=0.0,
            end_value=cfg.initial_learning_rate,
            transition_steps=cfg.warmup_steps,
        )
        sched = optax.join_schedules([warmup, sched], [cfg.warmup_steps])
    return sched


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Optimizer per cfg.optimizer (slim train surface: rmsprop default,
    momentum/sgd/adam alternatives) with optional global-norm gradient
    clipping (slim's clip_gradient_norm) applied BEFORE the update."""
    sched = make_lr_schedule(cfg)
    name = cfg.optimizer.lower()
    if name == "rmsprop":
        tx = optax.rmsprop(
            learning_rate=sched,
            decay=cfg.rmsprop_decay,
            eps=cfg.rmsprop_epsilon,
            momentum=cfg.rmsprop_momentum,
        )
    elif name == "momentum":
        tx = optax.sgd(learning_rate=sched, momentum=cfg.rmsprop_momentum)
    elif name == "sgd":
        tx = optax.sgd(learning_rate=sched)
    elif name == "adam":
        tx = optax.adam(learning_rate=sched, eps=cfg.adam_epsilon)
    else:
        raise ValueError(f"unknown optimizer: {cfg.optimizer!r}")
    if cfg.clip_gradient_norm > 0:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.clip_gradient_norm), tx
        )
    return tx


def create_train_state(cfg: Config, model, rng: jax.Array, num_priors: int) -> TrainState:
    """Initialize params/opt/EMA. ``model`` from ``inference.build_model``.

    Initialization runs as ONE jitted program pinned to the host CPU
    backend, then transfers to the default device: eager init dispatches
    thousands of tiny ops (minutes of RPC overhead on the remote `axon`
    platform), and compiling the init program remotely is even slower —
    the host CPU compiles it in under a second.
    """
    dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    tx = make_optimizer(cfg)

    def init(rng):
        variables = model.init(rng, dummy, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(lambda p: p + 0.0, params),
        )

    default = jax.devices()[0]
    if default.platform == "cpu":
        return jax.jit(init)(rng)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = jax.jit(init)(rng)
    from multibox_tpu.utils.transfer import fast_device_put

    return fast_device_put(state, default)


def make_train_step(cfg: Config, model, priors: jnp.ndarray):
    """Build the pure train-step function (jit it, or pjit it over a mesh).

    step(state, batch) -> (state, metrics); batch is a dict with
      images  [B, S, S, 3] float32 in [-1, 1]
      boxes   [B, G, 4]
      num_boxes [B] int32
    """
    tx = make_optimizer(cfg)
    priors = jnp.asarray(priors, jnp.float32)

    def forward(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )

    if cfg.remat:
        # jax.checkpoint: recompute backbone activations in the backward
        # pass instead of stashing them — HBM for FLOPs (cfg.remat).
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, batch):
        (loc, conf), updates = forward(params, batch_stats, batch["images"])
        total, metrics = multibox_loss(
            loc,
            conf,
            batch["boxes"],
            batch["num_boxes"],
            priors,
            alpha=cfg.location_loss_alpha,
            matching=cfg.matching,
            hybrid_conf_weight=cfg.hybrid_conf_weight,
            hard_negative_ratio=cfg.hard_negative_ratio,
            multi_match_iou=cfg.multi_match_iou,
            encode=cfg.box_encoding,
            gt_labels=batch.get("labels"),
            use_pallas=cfg.use_pallas,
            conf_loss=cfg.conf_loss,
            focal_gamma=cfg.focal_gamma,
            focal_alpha=cfg.focal_alpha,
        )
        return total, (updates["batch_stats"], metrics)

    def _grads_direct(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        return grads, new_stats, metrics

    def _grads_accumulated(state: TrainState, batch):
        # Gradient accumulation (cfg.grad_accum_steps = A): scan A
        # sequential microbatches of size B/A, summing gradients, then
        # average. Per-microbatch loss is already a mean over its images,
        # so the mean of A equal-sized microbatch grads equals the
        # full-batch grad (up to BN: train-mode BN normalizes over each
        # microbatch, the standard grad-accum approximation). Activation
        # memory scales with B/A; the gradient buffer is one param-sized
        # pytree carried through the scan.
        A = cfg.grad_accum_steps
        B = jax.tree.leaves(batch)[0].shape[0]
        if B % A != 0:
            raise ValueError(
                f"batch dim {B} not divisible by grad_accum_steps={A}"
            )
        micro = jax.tree.map(
            lambda x: x.reshape((A, B // A) + x.shape[1:]), batch
        )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, mb):
            stats, gsum = carry
            (_, (stats, metrics)), grads = grad_fn(state.params, stats, mb)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return (stats, gsum), metrics

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        (new_stats, gsum), metrics_a = jax.lax.scan(
            body, (state.batch_stats, zeros), micro
        )
        # Accumulate in f32 (zeros init), cast back to the param grad dtype.
        grads = jax.tree.map(
            lambda g, p: (g / A).astype(p.dtype), gsum, state.params
        )
        # Losses are per-image means → average across microbatches;
        # num_* metrics are batch SUMS → sum so they report on the full
        # effective batch.
        metrics = {
            k: jnp.sum(v, axis=0) if k.startswith("num_") else jnp.mean(v, axis=0)
            for k, v in metrics_a.items()
        }
        return grads, new_stats, metrics

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if cfg.grad_accum_steps > 1:
            grads, new_stats, metrics = _grads_accumulated(state, batch)
        else:
            grads, new_stats, metrics = _grads_direct(state, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMA shadows: slim ExponentialMovingAverage with num_updates —
        # effective decay ramps as min(decay, (1+t)/(10+t)) so short runs
        # aren't stuck at the (random) init shadows (the reference passes
        # the global step as num_updates; SURVEY.md §5.4).
        t = state.step.astype(jnp.float32)
        d = jnp.minimum(cfg.moving_average_decay, (1.0 + t) / (10.0 + t))
        new_ema = jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_params
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = dict(metrics)
        metrics["learning_rate"] = make_lr_schedule(cfg)(state.step)
        return new_state, metrics

    return train_step
