"""Headline benchmark: images/sec/chip at batch-32 detect (BASELINE.json).

Measures the full PRODUCTION detect pipeline (`make_detect_body` with the
default auto routing from BASELINE.md's measured Pallas-vs-XLA decision
matrix: UNfolded bf16 Inception-v3 on XLA's fused conv+BN+ReLU path, XLA
MultiBox head, box decode, and the batch-native Pallas NMS kernel — all in
one jitted on-device program) on the real TPU, plus p50 single-image
latency and achieved TFLOP/s / %MFU from XLA's own cost analysis; compares
against a TF-CPU Inception-v3 forward measured in the same process (the
reference stack is TF-CPU per BASELINE.json — the reference repo publishes
no numbers and the mount is empty, so the TF-CPU forward pass is the
fairest measurable stand-in).

Baseline asymmetry note (stated in the JSON): the TF-CPU baseline runs ONLY
the backbone forward — no decode/NMS/post-processing — while the rebuild
number includes the full detect pipeline. The bias is conservative (it
flatters the baseline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Extra detail goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

# Peak dense bf16 throughput of the bench chip (TPU v5e) for %MFU.
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _marginal_step_time(run, n, samples=3):
    """Per-step time as the SLOPE across chains of n, 2n and 3n steps.

    The relay charges a large FIXED cost per execution (measured round 3:
    0.8–1.5 s regardless of chain length, drifting with tunnel load), so
    total/n overstates the device step badly at small n. The chain-length
    slope cancels the fixed cost. This is the canonical BASELINE.md
    protocol ("min over interleaved chain lengths"): interleave
    ``samples`` runs of EACH length (so drift hits all lengths equally),
    take min PER LENGTH (the least-congested sample of each), compute the
    three pairwise slopes between the per-length mins, and report their
    MEDIAN. Median-of-pairwise-slopes is robust where min-of-slopes is
    optimistically biased (it once read a b32 train step at 10 ms / 54 %
    MFU, above the forward pass's own efficiency) and where a single
    (n,3n) pair inherits whatever drift slice the round end lands on
    (BENCH_r01–r04 under-read pinned train rows 10–30 % that way).

    ``run(k, n)`` must execute an n-step chain on rep-distinct input k
    (distinct bytes per k — the relay memoizes identical executions).
    Each length is warmed (compiled) here with an out-of-range rep before
    timing, so callers only need to have built ``run``.
    """
    lengths = [n, 2 * n, 3 * n]
    for i, length in enumerate(lengths):  # compile/warm outside the timing
        run(10_000 + i, length)
    totals = {length: [] for length in lengths}
    for r in range(samples):
        for i, length in enumerate(lengths):
            k = r * len(lengths) + i
            totals[length].append(_timed(lambda: run(k, length)))
    mins = [min(totals[length]) for length in lengths]
    pair_slopes = sorted(
        (mins[j] - mins[i]) / (lengths[j] - lengths[i])
        for i in range(len(lengths))
        for j in range(i + 1, len(lengths))
    )
    slope = pair_slopes[len(pair_slopes) // 2]
    log(
        "slope sweep: mins="
        + ", ".join(f"{length}:{t:.3f}s" for length, t in zip(lengths, mins))
        + "; pairwise slopes "
        + ", ".join(f"{s * 1e3:.2f}ms" for s in pair_slopes)
        + f"; median {slope * 1e3:.2f}ms"
    )
    if slope <= 0:  # pathological drift: fall back to the longest chain
        slope = mins[-1] / lengths[-1]
        log(f"non-positive slope; falling back to total/n = {slope * 1e3:.2f}ms")
    return slope


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu_detect(batch=32, iters=30, priors_count=256, latency=True,
                     backbone="inception_v3", input_size=299,
                     fallback_gflop_per_img=11.4):
    """Device-side chained timing: N data-dependent detect steps inside ONE
    jitted program, one host sync. Immune to (a) the remote runtime
    memoizing repeated identical calls and (b) the ~30ms D2H round-trip
    that dominates per-call sync through the tunnel.

    ``backbone``/``input_size`` select the model family — the MobileNetV2
    arms use (mobilenet_v2, 224), matching configs/mobilenet_edge.yaml."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multibox_tpu.config import Config
    from multibox_tpu.inference import build_model, make_detect_body

    log("devices:", jax.devices())
    cfg = Config(num_priors=priors_count, max_detections=100,
                 backbone=backbone, input_size=input_size)
    rng = np.random.default_rng(0)
    priors_np = np.sort(
        rng.uniform(0, 1, (priors_count, 2, 2)).astype(np.float32), axis=1
    ).reshape(priors_count, 4)
    priors = jnp.asarray(priors_np)

    # Init through the training-form model (BN stats present), then run the
    # production detect body (auto routing: XLA convs/head + Pallas NMS).
    model = build_model(cfg, priors_count)
    images = jnp.asarray(
        rng.uniform(-1, 1, (batch, input_size, input_size, 3)).astype(
            np.float32
        )
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), images[:1]))()
    detect_body = make_detect_body(cfg, priors, use_ema=False)

    def chained(variables, x, n):
        def body(i, carry):
            x, acc = carry
            out = detect_body(variables, x)
            s = out["scores"].sum()
            # negligible data dependency forces true sequential execution
            return x + (s * 1e-20).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    f = jax.jit(chained, static_argnums=2)

    def run(k, n):
        # distinct input per call: no relay call-memoization
        float(f(variables, images + np.float32(k + 1) * 1e-6, n))

    per = _marginal_step_time(run, iters)
    ips = batch / per
    log(f"TPU detect (chained x{iters}): {per * 1e3:.2f}ms/batch -> {ips:.1f} img/s")

    # Achieved TFLOP/s + %MFU from XLA's cost analysis of one detect step.
    flops_per_batch = None
    try:
        one_step = jax.jit(detect_body)
        comp = one_step.lower(variables, images).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_batch = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # cost analysis may be unsupported on a backend
        log("cost_analysis unavailable:", e)
    if flops_per_batch is None:
        # Analytic fallback (Inception-v3 fwd ≈ 11.4 GFLOP/img at 299²;
        # MobileNetV2 ≈ 0.6 GFLOP/img at 224²).
        flops_per_batch = fallback_gflop_per_img * 1e9 * batch
        log("using analytic FLOPs fallback")
    tflops = flops_per_batch / per / 1e12
    mfu = tflops / PEAK_TFLOPS
    log(
        f"detect step: {flops_per_batch / 1e9:.1f} GFLOP/batch -> "
        f"{tflops:.1f} TFLOP/s = {100 * mfu:.1f}% MFU (peak {PEAK_TFLOPS})"
    )

    # p50 single-image latency: per-call including one host sync (that IS
    # the latency a single-image caller experiences).
    if not latency:
        return ips, None, tflops, mfu
    one = images[:1]
    detect_one = jax.jit(detect_body)
    # warm with a REAL sync — block_until_ready does not sync through the
    # relay (CLAUDE.md), so it left the compile in flight and polluted the
    # first latency sample (median-of-30 hid it, but be honest)
    float(detect_one(variables, one)["num"].sum())
    lat = []
    for i in range(30):
        # vary input to defeat call memoization
        x = one + np.float32(i) * 1e-6
        t0 = time.perf_counter()
        out = detect_one(variables, x)
        float(out["num"].sum())
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat) * 1e3)
    log(f"TPU p50 single-image detect latency: {p50:.2f} ms (incl host sync)")
    return ips, p50, tflops, mfu


def bench_tpu_detect_int8(batch=32, iters=20, priors_count=256,
                          backbone="inception_v3", input_size=299):
    """Secondary metric: the int8 PTQ detect path (cfg.quantize="int8" —
    per-channel int8 weights, calibrated activations, MXU int8 convs).
    Same chained slope harness as the headline; reported as extra JSON
    fields, never as the headline (bf16 is the production default)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multibox_tpu.config import Config
    from multibox_tpu.inference import build_model, make_detect_body
    from multibox_tpu.quantize import prepare_quantized_variables

    cfg = Config(num_priors=priors_count, max_detections=100,
                 backbone=backbone, input_size=input_size)
    qcfg = Config(
        num_priors=priors_count, max_detections=100, quantize="int8",
        backbone=backbone, input_size=input_size,
    )
    rng = np.random.default_rng(0)
    priors = jnp.asarray(
        np.sort(
            rng.uniform(0, 1, (priors_count, 2, 2)).astype(np.float32), axis=1
        ).reshape(priors_count, 4)
    )
    model = build_model(cfg, priors_count)
    images = jnp.asarray(
        rng.uniform(-1, 1, (batch, input_size, input_size, 3)).astype(
            np.float32
        )
    )
    variables = dict(
        jax.jit(lambda: model.init(jax.random.PRNGKey(0), images[:1]))()
    )
    calib = [rng.integers(0, 255, (8, input_size, input_size, 3)).astype(
        np.uint8
    )]
    vq = prepare_quantized_variables(qcfg, variables, calib)
    body = make_detect_body(qcfg, priors)

    def chained(v, x, n):
        def step(i, carry):
            x, acc = carry
            out = body(v, x)
            s = out["scores"].sum()
            return x + (s * 1e-20).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, n, step, (x, jnp.float32(0)))
        return acc

    f = jax.jit(chained, static_argnums=2)

    def run(k, n):
        float(f(vq, images + np.float32(k + 1) * 1e-6, n))

    per = _marginal_step_time(run, iters)
    ips = batch / per
    log(
        f"TPU int8 detect (chained x{iters}): {per * 1e3:.2f}ms/batch "
        f"-> {ips:.1f} img/s"
    )
    return ips, per * 1e3


def bench_tpu_train(batch=32, iters=20, priors_count=256, canvas=343):
    """Full production train step (on-device aug + fwd + match + loss + bwd
    + opt + EMA) — chained: N steps in one device call with the state
    threaded through, so each step's forward depends on the previous
    step's parameter update (the data dependency ALSO defeats XLA
    dead-code-eliminating the backward pass — see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multibox_tpu.config import Config
    from multibox_tpu.inference import build_model
    from multibox_tpu.train.loop import make_augmented_train_step
    from multibox_tpu.train.state import create_train_state

    cfg = Config(num_priors=priors_count, batch_size=batch)
    rng = np.random.default_rng(0)
    priors = jnp.asarray(
        np.sort(
            rng.uniform(0, 1, (priors_count, 2, 2)).astype(np.float32), axis=1
        ).reshape(priors_count, 4)
    )
    model = build_model(cfg, priors_count)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), priors_count)
    step = make_augmented_train_step(cfg, model, priors)

    G = cfg.max_num_bboxes
    batch_np = {
        "images": rng.integers(0, 255, (batch, canvas, canvas, 3)).astype(
            np.uint8
        ),
        "boxes": np.sort(
            rng.uniform(0.1, 0.9, (batch, G, 2, 2)).astype(np.float32), axis=2
        ).reshape(batch, G, 4),
        "num_boxes": np.full((batch,), 4, np.int32),
    }

    def chained(state, b, n):
        def body(i, carry):
            state, _ = carry
            state, metrics = step(state, b)
            return state, metrics["loss"]

        state, loss = jax.lax.fori_loop(
            0, n, body, (state, jnp.float32(0))
        )
        # depend on the final updated params so no step is dead code
        leaf = jax.tree.leaves(state.params)[0]
        return loss + jnp.sum(leaf.astype(jnp.float32)) * 1e-12

    from multibox_tpu.utils.transfer import fast_device_put

    dev_batch = fast_device_put(batch_np, jax.devices()[0])
    f = jax.jit(chained, static_argnums=2)

    def run(k, n):
        batch2 = dict(batch_np)
        # distinct nonzero uint8 mask per rep (k may exceed 255 — the
        # estimator's warmup reps are out-of-range by design)
        batch2["images"] = batch_np["images"] ^ np.uint8((k % 255) + 1)
        dev_batch2 = fast_device_put(batch2, jax.devices()[0])
        float(f(state, dev_batch2, n))

    per = _marginal_step_time(run, iters)
    ips = batch / per

    flops = None
    try:
        one = jax.jit(step, donate_argnums=())
        comp = one.lower(state, dev_batch).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        log("train cost_analysis unavailable:", e)
    if flops is None:
        # fwd+bwd ≈ 3× fwd FLOPs; Inception-v3 fwd ≈ 11.4 GFLOP/img.
        flops = 3 * 11.4e9 * batch
        log("using analytic train-FLOPs fallback")
    tflops = flops / per / 1e12
    mfu = tflops / PEAK_TFLOPS
    log(
        f"TPU train step b{batch} (chained x{iters}): {per * 1e3:.2f}ms "
        f"-> {ips:.1f} img/s, {tflops:.1f} TFLOP/s = {100 * mfu:.1f}% MFU"
    )
    return ips, per * 1e3, tflops, mfu


def bench_tf_cpu(batch=32, iters=3):
    """TF-CPU Inception-v3 forward — the reference's compute substrate."""
    try:
        import tensorflow as tf
    except Exception as e:  # pragma: no cover
        log("tensorflow unavailable for baseline:", e)
        return None
    tf.config.set_visible_devices([], "GPU")
    model = tf.keras.applications.InceptionV3(
        weights=None, include_top=False, input_shape=(299, 299, 3)
    )
    x = np.random.default_rng(0).uniform(-1, 1, (batch, 299, 299, 3)).astype(
        np.float32
    )
    model(x, training=False)  # warmup/trace
    t0 = time.perf_counter()
    for _ in range(iters):
        model(x, training=False)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    log(f"TF-CPU inception fwd: batch={batch} iters={iters} -> {ips:.1f} img/s")
    return ips


def _probe_device(timeout_s: float):
    """Fail fast (with a diagnosable JSON line) if the device is
    unreachable, instead of hanging the whole bench.

    The axon relay has real outages (round 3 observed a multi-hour one);
    ``jax.devices()`` then blocks indefinitely and cannot be interrupted
    from this thread, so a watchdog thread prints the error line and
    hard-exits. Armed only around this first trivial device op — later
    cold compiles may legitimately take minutes and must not be killed."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "images_per_sec_per_chip_batch32_detect",
                        "value": 0.0,
                        "unit": "images/sec",
                        "vs_baseline": None,
                        "error": (
                            f"device unreachable: first trivial device op "
                            f"did not complete within {timeout_s:.0f}s "
                            "(relay outage?)"
                        ),
                    }
                ),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    log("probing device:", jax.devices())
    float(jnp.ones((8,)).sum())
    done.set()


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    _probe_device(float(os.environ.get("BENCH_DEVICE_TIMEOUT", "600")))
    tpu_ips, p50, tflops, mfu = bench_tpu_detect(batch=batch)
    extras = {}
    if os.environ.get("BENCH_SKIP_INT8", "0") != "1":
        try:
            q_ips, q_ms = bench_tpu_detect_int8(batch=batch)
            extras.update(
                detect_int8_img_per_sec=round(q_ips, 1),
                detect_int8_step_ms=round(q_ms, 2),
            )
        except Exception as e:  # secondary metric must never sink the headline
            log("int8 detect bench failed:", e)
    if os.environ.get("BENCH_SKIP_B128", "0") != "1":
        try:
            # Throughput-scaling row: the same detect program at batch 128
            # fills the MXU far better than b32 (BASELINE.md roofline: the
            # backbone ceiling is ~46% MFU at b128 vs ~22% at b32).
            ips128, _, tf128, mfu128 = bench_tpu_detect(
                batch=128, iters=10, latency=False
            )
            extras.update(
                detect_b128_img_per_sec=round(ips128, 1),
                detect_b128_tflops=round(tf128, 2),
                detect_b128_mfu=round(mfu128, 4),
            )
        except Exception as e:  # secondary metric must never sink the headline
            log("b128 detect bench failed:", e)
    if os.environ.get("BENCH_SKIP_TRAIN", "0") != "1":
        try:
            t_ips, t_ms, t_tf, t_mfu = bench_tpu_train(batch=batch)
            extras.update(
                train_img_per_sec=round(t_ips, 1),
                train_step_ms=round(t_ms, 2),
                train_tflops=round(t_tf, 2),
                train_mfu=round(t_mfu, 4),
            )
            t_ips128, t_ms128, t_tf128, t_mfu128 = bench_tpu_train(batch=128)
            extras.update(
                train_b128_img_per_sec=round(t_ips128, 1),
                train_b128_step_ms=round(t_ms128, 2),
                train_b128_tflops=round(t_tf128, 2),
                train_b128_mfu=round(t_mfu128, 4),
            )
        except Exception as e:  # train bench must never sink the headline
            log("train bench failed:", e)
    if os.environ.get("BENCH_SKIP_MOBILENET", "0") != "1":
        try:
            # Edge/latency backbone rows (configs/mobilenet_edge.yaml:
            # MobileNetV2 @224, 128 priors) — the framework's second model
            # family must carry pinned chip numbers, not promises.
            m_ips, m_p50, m_tf, m_mfu = bench_tpu_detect(
                batch=batch, iters=10, priors_count=128,
                backbone="mobilenet_v2", input_size=224,
                fallback_gflop_per_img=0.6,
            )
            extras.update(
                mobilenet_detect_img_per_sec=round(m_ips, 1),
                mobilenet_detect_p50_ms=round(m_p50, 2),
                mobilenet_detect_tflops=round(m_tf, 2),
                mobilenet_detect_mfu=round(m_mfu, 4),
            )
            mq_ips, mq_ms = bench_tpu_detect_int8(
                batch=batch, iters=10, priors_count=128,
                backbone="mobilenet_v2", input_size=224,
            )
            extras.update(
                mobilenet_int8_img_per_sec=round(mq_ips, 1),
                mobilenet_int8_step_ms=round(mq_ms, 2),
            )
        except Exception as e:  # secondary metric must never sink the headline
            log("mobilenet bench failed:", e)
    tf_ips = bench_tf_cpu(batch=batch)
    vs = (tpu_ips / tf_ips) if tf_ips else None
    log(f"p50_latency_ms={p50}")
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_batch32_detect",
                "value": round(tpu_ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(vs, 2) if vs else None,
                "tflops": round(tflops, 2),
                "mfu": round(mfu, 4),
                "p50_latency_ms": round(p50, 2),
                **extras,
                "baseline_note": (
                    "TF-CPU baseline is backbone fwd only; rebuild number "
                    "includes full detect pipeline (bias favors baseline)"
                ),
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
