"""C++ native layer (tfrecord reader + libjpeg decode) vs python references."""

import subprocess
import os

import numpy as np
import pytest

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "multibox_tpu",
    "native",
)


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
    from multibox_tpu.data import _native

    if not _native.available():
        pytest.skip("native library unavailable")


def test_native_reader_matches_python(tmp_path, rng):
    from multibox_tpu.data import _native
    from multibox_tpu.data.tfrecord import TFRecordReader, TFRecordWriter

    paths = []
    want = []
    for f in range(3):
        path = str(tmp_path / f"f{f}.tfrecord")
        with TFRecordWriter(path) as w:
            for i in range(20):
                rec = bytes(rng.integers(0, 256, rng.integers(0, 5000)).astype(np.uint8))
                w.write(rec)
                want.append(rec)
        paths.append(path)
    got = list(_native.read_records(paths))
    assert got == want


def test_native_reader_empty_file(tmp_path):
    from multibox_tpu.data import _native

    path = str(tmp_path / "empty.tfrecord")
    open(path, "wb").close()
    assert list(_native.read_records([path])) == []


def test_native_reader_detects_corruption(tmp_path):
    from multibox_tpu.data import _native
    from multibox_tpu.data.tfrecord import TFRecordWriter

    path = str(tmp_path / "bad.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(b"payload-payload")
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        list(_native.read_records([path]))


def test_native_reader_missing_file():
    from multibox_tpu.data import _native

    with pytest.raises(IOError):
        list(_native.read_records(["/nonexistent/x.tfrecord"]))


def test_native_crc_matches_python():
    import ctypes

    from multibox_tpu.data import _native
    from multibox_tpu.data.tfrecord import masked_crc

    lib = _native._lib()
    lib.mbx_masked_crc32c.restype = ctypes.c_uint32
    lib.mbx_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    for payload in [b"", b"a", b"hello world" * 100]:
        got = lib.mbx_masked_crc32c(payload, len(payload))
        assert got == masked_crc(payload), payload


def test_native_jpeg_decode_matches_pil(rng):
    from multibox_tpu.data import _native
    from multibox_tpu.data.jpeg import decode_jpeg, encode_jpeg
    from tests.test_data import synth_image

    img = synth_image(rng, 60, 90)
    data = encode_jpeg(img, quality=92)
    ours = _native.decode_jpeg(data).astype(int)
    pil = decode_jpeg(data, backend="pil").astype(int)
    assert ours.shape == pil.shape
    # Same libjpeg family; IDCT differences bounded.
    assert np.abs(ours - pil).mean() < 1.0


def test_native_jpeg_decode_with_canvas(rng):
    from multibox_tpu.data import _native
    from multibox_tpu.data.jpeg import encode_jpeg
    from tests.test_data import synth_image

    img = synth_image(rng, 48, 64)
    out = _native.decode_jpeg(encode_jpeg(img), canvas=32)
    assert out.shape == (32, 32, 3)


def test_native_jpeg_rejects_garbage():
    from multibox_tpu.data import _native

    with pytest.raises(ValueError):
        _native.decode_jpeg(b"not a jpeg at all")


def test_read_records_auto_routes_native(tmp_path):
    """data.tfrecord.read_records prefers the native reader when built."""
    from multibox_tpu.data.tfrecord import TFRecordWriter, read_records

    path = str(tmp_path / "x.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(b"one")
        w.write(b"two")
    assert list(read_records([path])) == [b"one", b"two"]
