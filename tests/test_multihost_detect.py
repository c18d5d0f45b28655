"""Multi-HOST detect/eval: process-sharded inputs, local-device detection,
cross-process result gather.

The reference is single-process (SURVEY.md §2.3); multi-host eval is
rebuild-side scope. Real multi-host hardware is unavailable, so this runs
the REAL ``jax.distributed`` runtime with 2 processes on the CPU backend
(Gloo collectives over localhost) — the multi-process extension of the
suite's fake-8-device strategy (SURVEY.md §4). Each worker shards the
records per process, detects on its local devices, and all-gathers the
results; the parent checks the gathered set against a single-process run.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

from multibox_tpu.data.example_proto import build_detection_example
from multibox_tpu.data.jpeg import encode_jpeg
from multibox_tpu.data.tfrecord import TFRecordWriter

_NUM_IMAGES = 10  # not a multiple of batch_size * nprocs: exercises padding


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("multihost")
    rng = np.random.default_rng(7)
    path = str(root / "data.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(_NUM_IMAGES):
            img = np.full((80, 80, 3), 25, np.uint8)
            y0, x0 = rng.uniform(0.1, 0.5, 2)
            y1, x1 = min(y0 + 0.3, 0.95), min(x0 + 0.3, 0.95)
            img[int(y0 * 80):int(y1 * 80), int(x0 * 80):int(x1 * 80)] = [
                210, 170, 60,
            ]
            w.write(
                build_detection_example(
                    encode_jpeg(img), f"img-{i}",
                    np.array([[y0, x0, y1, x1]]), labels=[1],
                    height=80, width=80,
                )
            )
    # Raw image FILES for the --images path (distinct sizes so the
    # gathered source-size map is discriminating); 5 files across 2
    # processes exercises uneven shards + final-batch padding.
    from PIL import Image

    for i in range(5):
        img = np.full((40 + i, 40, 3), 25, np.uint8)
        img[8:24, 8:24] = [210, 170, 60]
        Image.fromarray(img).save(str(root / f"rawimg_{i}.jpg"))

    cfg = {
        "INPUT_SIZE": 75,
        "BATCH_SIZE": 2,
        "MAX_NUM_BBOXES": 4,
        "compute_dtype": "float32",
        "detect_score_threshold": 0.0,
        "max_detections": 8,
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    from multibox_tpu import priors as priors_mod

    priors = np.asarray(
        priors_mod.generate_priors_kmeans(
            np.tile(np.array([[0.2, 0.2, 0.6, 0.6]]), (32, 1))
            + np.random.default_rng(0).uniform(-0.1, 0.1, (32, 4)),
            num_priors=8,
            seed=0,
        )
    )
    priors_mod.save_priors(priors, str(root / "priors.pkl"))
    return {"root": root, "tfrecord": path, "priors": priors}


@pytest.fixture(scope="module")
def reference_results(workdir):
    """Single-process run of the SAME detect loop (this process: 8 fake
    CPU devices, batch 2 → per-batch path on device 0)."""
    from multibox_tpu.config import parse_config_file
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.inference import build_model, run_detect_loop
    from multibox_tpu.train.state import create_train_state

    import jax

    cfg = parse_config_file(str(workdir["root"] / "config.yaml"))
    priors = workdir["priors"]
    cfg.num_priors = priors.shape[0]
    model = build_model(cfg, priors.shape[0])
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), priors.shape[0]
    )
    dataset = DetectionDataset(
        [workdir["tfrecord"]],
        batch_size=cfg.batch_size,
        canvas_size=cfg.input_size,
        max_num_bboxes=cfg.max_num_bboxes,
    )
    return run_detect_loop(cfg, state.detect_variables(), dataset, priors)


@pytest.fixture(scope="module")
def reference_img_results(workdir):
    """Single-process run of the SAME raw-file detect (--images path)."""
    import glob

    import jax

    from multibox_tpu.config import parse_config_file
    from multibox_tpu.data.pipeline import ImageFileDataset
    from multibox_tpu.inference import build_model, run_detect_loop
    from multibox_tpu.train.state import create_train_state

    cfg = parse_config_file(str(workdir["root"] / "config.yaml"))
    priors = workdir["priors"]
    cfg.num_priors = priors.shape[0]
    model = build_model(cfg, priors.shape[0])
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), priors.shape[0]
    )
    ds = ImageFileDataset(
        sorted(glob.glob(str(workdir["root"] / "rawimg_*.jpg"))),
        batch_size=cfg.batch_size, canvas_size=cfg.input_size,
    )
    return run_detect_loop(cfg, state.detect_variables(), ds, priors)


def test_allgather_objects_single_process_passthrough():
    from multibox_tpu.parallel.gather import process_allgather_objects

    obj = {"a": np.arange(3), "b": "x"}
    out = process_allgather_objects(obj)
    assert len(out) == 1 and out[0] is obj


def test_coordination_barrier_single_process_noop():
    """Single-process (and no-coordinator) calls must return immediately
    so call sites need no process-count branches (parallel.sync)."""
    from multibox_tpu.parallel.sync import coordination_barrier

    coordination_barrier("unit")  # would hang/raise if not a no-op


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(workdir, ndev_per_proc, nprocs=2, timeout=600):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev_per_proc}"
    )
    env["PYTHONPATH"] = (
        f"/root/repo:{env.get('PYTHONPATH', '')}".rstrip(":")
    )
    script = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(port), str(pid), str(nprocs),
             str(workdir["root"])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"


def _check(workdir, reference_results, nprocs=2):
    ref = {r["image_id"]: r for r in reference_results}
    for pid in range(nprocs):
        with open(workdir["root"] / f"results_{pid}.pkl", "rb") as f:
            got = pickle.load(f)
        # Global coverage: every image exactly once, on every host.
        ids = [r["image_id"] for r in got]
        assert sorted(ids) == sorted(ref.keys())
        for r in got:
            e = ref[r["image_id"]]
            assert np.allclose(r["boxes"], e["boxes"], atol=1e-4)
            assert np.allclose(r["scores"], e["scores"], atol=1e-4)
            assert np.array_equal(r["classes"], e["classes"])
        os.remove(workdir["root"] / f"results_{pid}.pkl")


def _check_images(workdir, reference_img_results, nprocs=2):
    """--images path: gathered results match the single-process run and
    the all-gathered source-size map covers the full file set (what
    cli/detect.py --coco_json consumes)."""
    ref = {r["image_id"]: r for r in reference_img_results}
    want_sizes = {f"rawimg_{i}.jpg": (40 + i, 40) for i in range(5)}
    for pid in range(nprocs):
        with open(workdir["root"] / f"img_results_{pid}.pkl", "rb") as f:
            got = pickle.load(f)
        ids = [r["image_id"] for r in got["results"]]
        assert sorted(ids) == sorted(ref.keys())
        for r in got["results"]:
            e = ref[r["image_id"]]
            assert np.allclose(r["boxes"], e["boxes"], atol=1e-4)
            assert np.allclose(r["scores"], e["scores"], atol=1e-4)
        assert got["sizes"] == want_sizes
        os.remove(workdir["root"] / f"img_results_{pid}.pkl")


def test_two_process_detect_matches_single_process(
    workdir, reference_results, reference_img_results
):
    """2 processes × 1 local device: per-batch path + result gather, for
    both tfrecord and raw-file (--images) inputs."""
    _spawn_workers(workdir, ndev_per_proc=1)
    _check(workdir, reference_results)
    _check_images(workdir, reference_img_results)


def test_two_process_local_mesh_detect(
    workdir, reference_results, reference_img_results
):
    """2 processes × 2 local devices (batch divisible): each host shards
    its batch over its LOCAL mesh — the pdetect path under multi-process."""
    _spawn_workers(workdir, ndev_per_proc=2)
    _check(workdir, reference_results)
    _check_images(workdir, reference_img_results)


def test_multihost_requires_sharded_dataset(monkeypatch, workdir):
    """An un-sharded dataset on a multi-process mesh must fail loudly
    (silent duplicate detection would corrupt eval metrics)."""
    import jax

    from multibox_tpu.config import parse_config_file
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.inference import run_detect_loop

    cfg = parse_config_file(str(workdir["root"] / "config.yaml"))
    dataset = DetectionDataset(
        [workdir["tfrecord"]], batch_size=2, canvas_size=75,
        max_num_bboxes=4,
    )
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="process-sharded"):
        run_detect_loop(cfg, {}, dataset, workdir["priors"])
