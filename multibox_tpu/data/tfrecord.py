"""TFRecord container format: pure-python reader/writer (+ C++ fast path).

Format (each record):
  uint64 length | uint32 masked_crc32c(length) | bytes data | uint32 masked_crc32c(data)

The masked CRC is ``rot(crc32c(x), 15) + 0xa282ead8`` (TF convention).
This implementation is self-contained — the runtime does not need the
TensorFlow package to read the reference's data files. A C++ reader with
mmap + threaded prefetch lives in ``multibox_tpu/native`` and is used
automatically when its shared library has been built
(``multibox_tpu.data._native``).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional

_MASK_DELTA = 0xA282EAD8

# CRC32C (Castagnoli) table, polynomial 0x82F63B78 (reflected).
_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_table()

try:  # zlib has crc32 but not crc32c; google-crc32c may exist
    from crc32c import crc32c as _fast_crc32c  # type: ignore

    def crc32c(data: bytes) -> int:
        return _fast_crc32c(data)

except ImportError:

    def crc32c(data: bytes) -> int:
        crc = 0xFFFFFFFF
        table = _CRC_TABLE
        for b in data:
            crc = (crc >> 8) ^ table[(crc ^ b) & 0xFF]
        return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + _MASK_DELTA & 0xFFFFFFFF


class TFRecordWriter:
    """Minimal tfrecord writer (fixtures, dataset-builder CLI)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        length = struct.pack("<Q", len(record))
        self._f.write(length)
        self._f.write(struct.pack("<I", masked_crc(length)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TFRecordReader:
    """Sequential tfrecord reader with CRC verification."""

    def __init__(self, path: str, verify_crc: bool = True):
        self.path = path
        self.verify_crc = verify_crc

    def __iter__(self) -> Iterator[bytes]:
        with open(self.path, "rb") as f:
            while True:
                header = f.read(12)
                if not header:
                    return
                if len(header) < 12:
                    raise IOError(f"truncated record header in {self.path}")
                (length,) = struct.unpack("<Q", header[:8])
                (len_crc,) = struct.unpack("<I", header[8:12])
                if self.verify_crc and masked_crc(header[:8]) != len_crc:
                    raise IOError(f"corrupt length crc in {self.path}")
                data = f.read(length)
                if len(data) < length:
                    raise IOError(f"truncated record body in {self.path}")
                (data_crc,) = struct.unpack("<I", f.read(4))
                if self.verify_crc and masked_crc(data) != data_crc:
                    raise IOError(f"corrupt record crc in {self.path}")
                yield data


def read_records(
    paths, verify_crc: bool = True, use_native: Optional[bool] = None
) -> Iterator[bytes]:
    """Iterate records across files. Prefers the C++ reader when built."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    if use_native is None or use_native:
        yielded_any = False
        try:
            from multibox_tpu.data import _native

            if _native.available():
                for rec in _native.read_records(
                    list(map(str, paths)), verify_crc=verify_crc
                ):
                    yielded_any = True
                    yield rec
                return
        except Exception:
            # Fall back to the python reader only if the native path failed
            # BEFORE producing anything — restarting mid-stream would
            # silently duplicate already-yielded records.
            if use_native or yielded_any:
                raise
    for path in paths:
        yield from TFRecordReader(str(path), verify_crc=verify_crc)
