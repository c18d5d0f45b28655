"""Data layer: tfrecord/Example codec vs TF oracles, JPEG decode parity,
on-device resize/crop parity, augmentation invariants (SURVEY.md §4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multibox_tpu.config import Config
from multibox_tpu.data import augment
from multibox_tpu.data.example_proto import (
    build_detection_example,
    build_example,
    parse_detection_example,
    parse_example,
)
from multibox_tpu.data.jpeg import decode_jpeg, encode_jpeg
from multibox_tpu.data.pipeline import DetectionDataset, Prefetcher, pad_boxes
from multibox_tpu.data.tfrecord import TFRecordReader, TFRecordWriter
from tests.conftest import random_boxes

# Fast tier: no 8-device e2e state, runs in the `-m smoke` subset.
pytestmark = pytest.mark.smoke


def synth_image(rng, h=64, w=80):
    # Smooth gradient + blobs: survives JPEG without huge error.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [yy / h * 255, xx / w * 255, (yy + xx) / (h + w) * 255], axis=-1
    )
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# tfrecord framing
# ---------------------------------------------------------------------------


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "a.tfrecord")
    records = [b"hello", b"", b"x" * 10000]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(TFRecordReader(path))
    assert got == records


def test_tfrecord_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "a.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(b"payload-1")
        w.write(b"payload-2")
    got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
    assert got == [b"payload-1", b"payload-2"]


def test_tfrecord_reads_tensorflow_files(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tfwrote.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(b"abc")
        w.write(b"d" * 999)
    got = list(TFRecordReader(path))
    assert got == [b"abc", b"d" * 999]


def test_tfrecord_detects_corruption(tmp_path):
    path = str(tmp_path / "bad.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(b"payload")
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        list(TFRecordReader(path))


# ---------------------------------------------------------------------------
# Example proto codec
# ---------------------------------------------------------------------------


def test_example_roundtrip_ours():
    feats = {
        "bytes": [b"a", b"bb"],
        "floats": [1.5, -2.25, 0.0],
        "ints": [0, 1, -1, 2**40],
    }
    got = parse_example(build_example(feats))
    assert got["bytes"] == [b"a", b"bb"]
    np.testing.assert_allclose(got["floats"], feats["floats"])
    assert got["ints"] == feats["ints"]


def test_example_parses_tensorflow_encoding():
    tf = pytest.importorskip("tensorflow")
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"JPEGDATA"])
                ),
                "image/object/bbox/ymin": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[0.1, 0.5])
                ),
                "image/object/class/label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[3, -7])
                ),
            }
        )
    )
    got = parse_example(ex.SerializeToString())
    assert got["image/encoded"] == [b"JPEGDATA"]
    np.testing.assert_allclose(got["image/object/bbox/ymin"], [0.1, 0.5], atol=1e-7)
    assert got["image/object/class/label"] == [3, -7]


def test_tensorflow_parses_our_encoding():
    tf = pytest.importorskip("tensorflow")
    ser = build_detection_example(
        b"IMG", "img-7", [[0.1, 0.2, 0.3, 0.4]], labels=[5], height=10, width=20
    )
    ex = tf.train.Example()
    ex.ParseFromString(ser)
    f = ex.features.feature
    assert f["image/encoded"].bytes_list.value[0] == b"IMG"
    assert f["image/id"].bytes_list.value[0] == b"img-7"
    np.testing.assert_allclose(f["image/object/bbox/xmin"].float_list.value, [0.2])
    assert list(f["image/object/class/label"].int64_list.value) == [5]
    assert list(f["image/height"].int64_list.value) == [10]


def test_detection_example_roundtrip(rng):
    boxes = random_boxes(rng, 3)
    ser = build_detection_example(b"JPEG", "id-1", boxes, labels=[1, 2, 3])
    got = parse_detection_example(ser)
    assert got["image_bytes"] == b"JPEG"
    assert got["image_id"] == "id-1"
    np.testing.assert_allclose(got["boxes"], boxes, atol=1e-7)
    np.testing.assert_array_equal(got["labels"], [1, 2, 3])


# ---------------------------------------------------------------------------
# JPEG decode
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_close(rng):
    img = synth_image(rng)
    data = encode_jpeg(img, quality=95)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_decode_parity_vs_tf(rng):
    pytest.importorskip("tensorflow")
    img = synth_image(rng)
    data = encode_jpeg(img, quality=90)
    ours = decode_jpeg(data, backend="pil").astype(int)
    tfs = decode_jpeg(data, backend="tf").astype(int)
    # Both are libjpeg; IDCT method may differ by ±1-2 counts.
    assert np.abs(ours - tfs).mean() < 1.0
    assert np.abs(ours - tfs).max() <= 16


# ---------------------------------------------------------------------------
# On-device resize / crop+resize
# ---------------------------------------------------------------------------


def test_bilinear_resize_parity_vs_tf(rng):
    tf = pytest.importorskip("tensorflow")
    img = synth_image(rng, 57, 91).astype(np.float32)[None]
    ours = np.asarray(augment.bilinear_resize(jnp.array(img), 32))
    tfs = tf.image.resize(img, (32, 32), method="bilinear", antialias=False).numpy()
    np.testing.assert_allclose(ours, tfs, atol=0.51)  # half-pixel conventions
    corr = np.corrcoef(ours.ravel(), tfs.ravel())[0, 1]
    assert corr > 0.9999


def test_crop_and_resize_identity_window(rng):
    img = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(
        augment.crop_and_resize(
            jnp.array(img), jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (2, 1)), 16
        )
    )
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_crop_and_resize_quarter(rng):
    # Cropping the top-left quarter of a 2x-block image == the block value.
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[:, :4, :4] = 1.0
    out = np.asarray(
        augment.crop_and_resize(jnp.array(img), jnp.array([[0.0, 0.0, 0.5, 0.5]]), 4)
    )
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Augmentation invariants
# ---------------------------------------------------------------------------


def test_transform_boxes_to_window(rng):
    boxes = jnp.array([[0.2, 0.2, 0.4, 0.4], [0.8, 0.8, 0.95, 0.95], [0, 0, 0, 0]])
    window = jnp.array([0.0, 0.0, 0.5, 0.5])  # keeps box 0, drops box 1
    new_boxes, new_num, _ = augment.transform_boxes_to_window(
        boxes, jnp.int32(2), window
    )
    assert int(new_num) == 1
    np.testing.assert_allclose(
        np.asarray(new_boxes[0]), [0.4, 0.4, 0.8, 0.8], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(new_boxes[1:]), 0.0)


def test_sample_crop_window_covers_objects(rng):
    key = jax.random.PRNGKey(0)
    boxes = jnp.array([[0.4, 0.4, 0.6, 0.6]] + [[0.0] * 4] * 3)
    for i in range(10):
        w = augment.sample_crop_window(
            jax.random.fold_in(key, i), boxes, jnp.int32(1),
            min_object_covered=1.0,
        )
        w = np.asarray(w)
        # The object must be fully inside (or the window is the full image).
        assert w[0] <= 0.4 + 1e-5 and w[1] <= 0.4 + 1e-5
        assert w[2] >= 0.6 - 1e-5 and w[3] >= 0.6 - 1e-5


def test_augment_batch_shapes_and_ranges(rng):
    cfg = Config(input_size=64, max_num_bboxes=4)
    B = 3
    images = jnp.array(
        rng.integers(0, 255, (B, 96, 96, 3)).astype(np.uint8)
    )
    boxes = jnp.array(np.stack([random_boxes(rng, 4) for _ in range(B)]))
    num = jnp.array([4, 2, 0], jnp.int32)
    fn = jax.jit(lambda k, i, b, n: augment.augment_batch(k, i, b, n, cfg))
    out_images, out_boxes, out_num = fn(jax.random.PRNGKey(0), images, boxes, num)
    assert out_images.shape == (B, 64, 64, 3)
    assert float(out_images.min()) >= -1.0 - 1e-5
    assert float(out_images.max()) <= 1.0 + 1e-5
    ob = np.asarray(out_boxes)
    on = np.asarray(out_num)
    assert (on <= np.asarray(num)).all()
    assert on[2] == 0
    # Valid boxes stay valid boxes; padded rows stay zero.
    for b in range(B):
        v = ob[b, : on[b]]
        assert (v[:, 2] >= v[:, 0] - 1e-6).all()
        assert (v[:, 3] >= v[:, 1] - 1e-6).all()
        np.testing.assert_allclose(ob[b, on[b]:], 0.0)


def test_augment_deterministic_per_key(rng):
    cfg = Config(input_size=32, max_num_bboxes=2)
    images = jnp.array(rng.integers(0, 255, (2, 48, 48, 3)).astype(np.uint8))
    boxes = jnp.array(np.stack([random_boxes(rng, 2) for _ in range(2)]))
    num = jnp.array([2, 1], jnp.int32)
    a = augment.augment_batch(jax.random.PRNGKey(7), images, boxes, num, cfg)
    b = augment.augment_batch(jax.random.PRNGKey(7), images, boxes, num, cfg)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# Dataset pipeline end-to-end on a fixture
# ---------------------------------------------------------------------------


def make_fixture(tmp_path, rng, n=10, name="fix.tfrecord"):
    path = str(tmp_path / name)
    with TFRecordWriter(path) as w:
        for i in range(n):
            img = synth_image(rng, 50 + i, 60)
            nb = int(rng.integers(0, 4))
            boxes = random_boxes(rng, nb) if nb else np.zeros((0, 4))
            w.write(
                build_detection_example(
                    encode_jpeg(img), f"img-{i}", boxes,
                    labels=list(range(1, nb + 1)),
                    height=img.shape[0], width=img.shape[1],
                )
            )
    return path


def test_dataset_batches(tmp_path, rng):
    path = make_fixture(tmp_path, rng, n=10)
    ds = DetectionDataset(
        [path], batch_size=4, canvas_size=64, max_num_bboxes=5
    )
    batches = list(ds)
    assert len(batches) == 3  # 4+4+2(padded)
    b = batches[0]
    assert b["images"].shape == (4, 64, 64, 3)
    assert b["images"].dtype == np.uint8
    assert b["boxes"].shape == (4, 5, 4)
    assert b["image_ids"][0] == "img-0"
    last = batches[-1]
    assert last["batch_valid"] == 2
    assert last["images"].shape == (4, 64, 64, 3)  # padded to full batch


def test_dataset_repeat_and_shuffle(tmp_path, rng):
    # shuffle_buffer sized to the dataset: with the default 512-record
    # reservoir a 6-image dataset mixes so deeply that full coverage in a
    # small window is a seed lottery, which is not the property to pin.
    path = make_fixture(tmp_path, rng, n=6)
    ds = DetectionDataset(
        [path], batch_size=4, canvas_size=32, max_num_bboxes=5,
        shuffle=True, repeat=True, seed=1, shuffle_buffer=6,
    )
    it = iter(ds)
    seen = []
    for _ in range(6):  # 24 images = 4 epochs
        seen += next(it)["image_ids"]
    assert len(seen) == 24
    assert set(seen) == {f"img-{i}" for i in range(6)}


def test_prefetcher_passthrough():
    got = list(Prefetcher(iter(range(7)), depth=2))
    assert got == list(range(7))


def test_pad_boxes():
    out, n = pad_boxes(np.ones((2, 4)), 5)
    assert out.shape == (5, 4) and n == 2
    out, n = pad_boxes(np.ones((9, 4)), 5)
    assert out.shape == (5, 4) and n == 5


def test_hue_rotation_properties(rng):
    """Structural checks: zero/full rotation are identity; luma preserved;
    grays are fixed points. (YIQ rotation is a different — smoother —
    transform than TF's HSV channel shift, so no elementwise TF parity.)"""
    from multibox_tpu.data.augment import _rotate_hue, _RGB_TO_YIQ

    img = jnp.array(rng.uniform(0.2, 0.8, (1, 8, 8, 3)).astype(np.float32))
    out0 = _rotate_hue(img, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1e-5)
    out_full = _rotate_hue(img, jnp.full((1,), 2 * np.pi))
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(img), atol=1e-4)

    rotated = _rotate_hue(img, jnp.full((1,), 1.0))
    assert float(jnp.abs(rotated - img).mean()) > 0.01  # actually does something
    # Luma (Y) is invariant under chroma-plane rotation.
    y_in = jnp.einsum("bhwc,c->bhw", img, _RGB_TO_YIQ[0])
    y_out = jnp.einsum("bhwc,c->bhw", rotated, _RGB_TO_YIQ[0])
    np.testing.assert_allclose(np.asarray(y_out), np.asarray(y_in), atol=1e-4)
    # Grays have zero chroma: fixed points of any rotation.
    gray = jnp.full((1, 4, 4, 3), 0.5)
    np.testing.assert_allclose(
        np.asarray(_rotate_hue(gray, jnp.full((1,), 2.0))), 0.5, atol=1e-5
    )


def test_raw_canvas_roundtrip_and_pipeline_skips_decode(tmp_path, rng):
    """image/raw shards: parse returns the canvas; the pipeline uses it
    without JPEG decode; different-canvas datasets resize it."""
    from multibox_tpu.data.example_proto import (
        build_detection_example, parse_detection_example,
    )
    from multibox_tpu.data.jpeg import encode_jpeg
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.data.tfrecord import TFRecordWriter

    canvas = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    rec = build_detection_example(
        encode_jpeg(canvas), "raw-1", np.array([[0.1, 0.1, 0.5, 0.5]]),
        labels=[1], raw_canvas=canvas,
    )
    ex = parse_detection_example(rec)
    np.testing.assert_array_equal(ex["raw"], canvas)

    path = str(tmp_path / "raw.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(rec)
    # Same canvas: exact passthrough, decode never runs.
    ds = DetectionDataset([path], batch_size=1, canvas_size=64)
    batch = next(iter(ds))
    np.testing.assert_array_equal(batch["images"][0], canvas)
    # Different canvas: resized from raw.
    ds2 = DetectionDataset([path], batch_size=1, canvas_size=32)
    batch2 = next(iter(ds2))
    assert batch2["images"].shape == (1, 32, 32, 3)


def test_decode_cache_serves_identical_items(tmp_path, rng):
    """cache_items: second epoch is served from RAM with identical content."""
    from multibox_tpu.data.example_proto import build_detection_example
    from multibox_tpu.data.jpeg import encode_jpeg
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.data.tfrecord import TFRecordWriter

    path = str(tmp_path / "c.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(4):
            img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
            w.write(build_detection_example(
                encode_jpeg(img), f"c-{i}",
                np.array([[0.2, 0.2, 0.6, 0.6]]), labels=[1],
            ))
    ds = DetectionDataset([path], batch_size=4, canvas_size=40,
                          cache_items=16)
    first = next(iter(ds))
    assert len(ds._cache) == 4
    second = next(iter(ds))
    np.testing.assert_array_equal(first["images"], second["images"])
    np.testing.assert_array_equal(first["boxes"], second["boxes"])


def test_decode_draft_mode_close_to_full_decode(rng):
    """DCT-scaled (draft) decode produces a close approximation of the
    full-decode path at the same canvas."""
    from multibox_tpu.data.jpeg import decode_jpeg, encode_jpeg

    # Smooth image: draft-mode differences stay small.
    y = np.linspace(0, 255, 256, dtype=np.float32)
    img = np.stack(np.broadcast_arrays(y[:, None], y[None, :], y[:, None]),
                   axis=-1).astype(np.uint8)
    data = encode_jpeg(img)
    full = decode_jpeg(data, canvas=64).astype(np.int32)
    draft = decode_jpeg(data, canvas=64, draft=True).astype(np.int32)
    assert np.abs(full - draft).mean() < 8.0


def test_dataset_cli_store_raw_canvas(tmp_path, rng):
    from multibox_tpu.cli.dataset import main
    from multibox_tpu.data.example_proto import parse_detection_example
    from multibox_tpu.data.jpeg import encode_jpeg
    from multibox_tpu.data.tfrecord import read_records
    import json

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = rng.integers(0, 255, (80, 60, 3)).astype(np.uint8)
    (img_dir / "a.jpg").write_bytes(encode_jpeg(img))
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps([{
        "image": "a.jpg", "id": "r-0",
        "boxes": [[0.1, 0.1, 0.4, 0.4]], "labels": [1],
    }]))
    prefix = str(tmp_path / "out" / "raw")
    assert main([
        "--annotations", str(ann), "--image_root", str(img_dir),
        "--output_prefix", prefix, "--num_shards", "1",
        "--store_raw_canvas", "48",
    ]) == 0
    (rec,) = list(read_records([f"{prefix}-00000-of-00001.tfrecord"]))
    ex = parse_detection_example(rec)
    assert ex["raw"].shape == (48, 48, 3)


def test_shuffle_buffer_persists_across_epochs(tmp_path):
    """With repeat=True the reservoir is NOT drained at epoch boundaries:
    consecutive records mix across epochs."""
    from multibox_tpu.data.pipeline import DetectionDataset
    from multibox_tpu.data.tfrecord import TFRecordWriter

    path = str(tmp_path / "s.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(8):
            w.write(f"rec-{i}".encode())
    ds = DetectionDataset([path], batch_size=1, shuffle=True,
                          shuffle_buffer=4, repeat=True, seed=0)
    stream = ds._records()
    first_16 = [next(stream) for _ in range(16)]
    # The buffer holds 4 records at every boundary, so the first "epoch's
    # worth" of yields cannot be a permutation of the 8 records — records
    # from epoch 2 appear among the first 8 yields' window of 12.
    window = first_16[:12]
    from collections import Counter

    counts = Counter(window)
    assert max(counts.values()) >= 2  # some record already repeated
    assert set(first_16) == {f"rec-{i}".encode() for i in range(8)}


def test_dataset_sharding_partitions_records(tmp_path, rng):
    """Multi-host DP input sharding: shards are disjoint, balanced, and
    their union is the full dataset (record-level round-robin)."""
    path = make_fixture(tmp_path, rng, n=10, name="shard.tfrecord")

    def ids(shard_index, shard_count, **kw):
        ds = DetectionDataset(
            [path], batch_size=2, canvas_size=32, max_num_bboxes=5,
            shard_index=shard_index, shard_count=shard_count, **kw,
        )
        out = []
        it = iter(ds)
        for b in it:
            out += b["image_ids"][: b.get("batch_valid", len(b["image_ids"]))]
        return out

    s0, s1 = ids(0, 2), ids(1, 2)
    assert len(s0) == len(s1) == 5
    assert not set(s0) & set(s1)
    assert set(s0) | set(s1) == {f"img-{i}" for i in range(10)}

    with pytest.raises(ValueError):
        DetectionDataset([path], batch_size=2, shard_index=2, shard_count=2)


def test_dataset_sharding_disjoint_under_shuffled_multifile(tmp_path, rng):
    """Sharded hosts must see IDENTICAL shuffled path orders (dedicated
    path rng), so a one-epoch shuffled multi-file run splits the dataset
    exactly: disjoint halves whose union is every record once."""
    paths = []
    for fi in range(3):
        p = str(tmp_path / f"uniq{fi}.tfrecord")
        with TFRecordWriter(p) as w:
            for i in range(4):
                img = synth_image(rng, 40, 40)
                w.write(
                    build_detection_example(
                        encode_jpeg(img), f"f{fi}-r{i}",
                        random_boxes(rng, 1), labels=[1],
                        height=40, width=40,
                    )
                )
        paths.append(p)

    def one_epoch(shard_index):
        ds = DetectionDataset(
            paths, batch_size=2, canvas_size=32, max_num_bboxes=5,
            shuffle=True, repeat=False, seed=7, shuffle_buffer=4,
            shard_index=shard_index, shard_count=2,
        )
        out = []
        for b in ds:
            out += b["image_ids"][: b.get("batch_valid", 2)]
        return out

    a, b = one_epoch(0), one_epoch(1)
    assert len(a) == len(b) == 6
    assert not set(a) & set(b)
    assert set(a) | set(b) == {f"f{f}-r{r}" for f in range(3) for r in range(4)}


def test_image_file_dataset(tmp_path, rng):
    """Raw-file detection input (multibox-detect --images): batch shapes,
    final-batch padding, source-size recording, PNG + JPEG decode, and
    basename-vs-path image ids."""
    from PIL import Image

    from multibox_tpu.data.pipeline import ImageFileDataset

    paths = []
    for i, (name, size, fmt) in enumerate(
        [("a.jpg", (60, 40), "JPEG"), ("b.png", (30, 50), "PNG"),
         ("c.jpg", (80, 80), "JPEG")]
    ):
        img = synth_image(rng, *size)
        p = str(tmp_path / name)
        Image.fromarray(img).save(p, format=fmt)
        paths.append(p)

    ds = ImageFileDataset(paths, batch_size=2, canvas_size=32)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 32, 32, 3)
    assert batches[0]["images"].dtype == np.uint8
    assert batches[0]["image_ids"] == ["a.jpg", "b.png"]
    assert batches[1]["batch_valid"] == 1  # padded final batch
    assert batches[1]["images"][1].sum() == 0
    # source pixel sizes recorded as (height, width)
    assert ds.sizes["a.jpg"] == (60, 40)
    assert ds.sizes["b.png"] == (30, 50)

    # basename collision -> full paths as ids
    sub = tmp_path / "sub"
    sub.mkdir()
    dup = str(sub / "a.jpg")
    Image.fromarray(synth_image(rng, 20, 20)).save(dup, format="JPEG")
    ds2 = ImageFileDataset([paths[0], dup], batch_size=2, canvas_size=16)
    (b,) = list(ds2)
    assert b["image_ids"] == [paths[0], dup]

    with pytest.raises(ValueError):
        ImageFileDataset([], batch_size=2, canvas_size=16)


def test_image_file_dataset_sharding(tmp_path, rng):
    """Multi-host --images: round-robin file shards partition the input
    exactly (same rule as DetectionDataset), ids stay GLOBALLY unique
    decisions, and each shard's sizes map covers exactly its own files
    (cli/detect.py all-gathers the maps for --coco_json)."""
    from PIL import Image

    from multibox_tpu.data.pipeline import ImageFileDataset

    paths = []
    for i in range(5):
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(synth_image(rng, 24 + i, 24)).save(p, format="JPEG")
        paths.append(p)

    shards = [
        ImageFileDataset(paths, batch_size=2, canvas_size=16,
                         shard_index=s, shard_count=2)
        for s in range(2)
    ]
    ids = []
    for ds in shards:
        for b in ds:
            ids += b["image_ids"][: int(b["batch_valid"])]
    assert sorted(ids) == sorted(f"img{i}.jpg" for i in range(5))
    assert shards[0].paths == [paths[0], paths[2], paths[4]]
    # per-shard sizes cover exactly the shard's files; merging the maps
    # (what cli/detect.py does after the gather) covers the full set
    merged = {}
    for ds in shards:
        assert set(ds.sizes) == {os.path.basename(p) for p in ds.paths}
        merged.update(ds.sizes)
    assert merged == {f"img{i}.jpg": (24 + i, 24) for i in range(5)}

    # id uniqueness is decided on the GLOBAL list: a basename collision
    # across different shards must still push every shard to full paths
    sub = tmp_path / "sub"
    sub.mkdir()
    dup = str(sub / "img0.jpg")
    Image.fromarray(synth_image(rng, 20, 20)).save(dup, format="JPEG")
    ds = ImageFileDataset([paths[0], dup], batch_size=2, canvas_size=16,
                          shard_index=1, shard_count=2)
    (b,) = list(ds)
    assert b["image_ids"][:1] == [dup]

    with pytest.raises(ValueError):
        ImageFileDataset(paths, batch_size=2, canvas_size=16,
                         shard_index=2, shard_count=2)
