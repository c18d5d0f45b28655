"""ctypes binding to the C++ native layer (libmultibox_native.so).

Provides the fast paths for tfrecord streaming (mmap + CRC32C-SSE4.2 +
background reader thread) and JPEG decode+resize (libjpeg). Falls back
transparently: ``available()`` is False until ``make -C
multibox_tpu/native`` has produced the shared library, and the pure-python
implementations in ``tfrecord.py``/``jpeg.py`` take over.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

_LIB = None
_LOAD_TRIED = False


def _lib():
    global _LIB, _LOAD_TRIED
    if not _LOAD_TRIED:
        _LOAD_TRIED = True
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "native",
            "libmultibox_native.so",
        )
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.mbx_stream_open.restype = ctypes.c_void_p
            lib.mbx_stream_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.mbx_stream_next.restype = ctypes.c_int
            lib.mbx_stream_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.mbx_free_record.argtypes = [ctypes.POINTER(ctypes.c_char)]
            lib.mbx_stream_error.restype = ctypes.c_char_p
            lib.mbx_stream_error.argtypes = [ctypes.c_void_p]
            lib.mbx_stream_close.argtypes = [ctypes.c_void_p]
            lib.mbx_decode_jpeg.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.mbx_decode_jpeg.argtypes = [
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.mbx_free_image.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
            _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def read_records(
    paths: Sequence[str], verify_crc: bool = True, queue_capacity: int = 256
) -> Iterator[bytes]:
    """Stream records across files via the native reader thread."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built")
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode("utf-8") for p in paths]
    )
    stream = lib.mbx_stream_open(
        arr, len(paths), 1 if verify_crc else 0, queue_capacity
    )
    if not stream:
        raise IOError("failed to open tfrecord stream")
    try:
        data = ctypes.POINTER(ctypes.c_char)()
        size = ctypes.c_uint64()
        while True:
            r = lib.mbx_stream_next(stream, ctypes.byref(data), ctypes.byref(size))
            if r == 1:
                try:
                    yield ctypes.string_at(data, size.value)
                finally:
                    lib.mbx_free_record(data)
            elif r == 0:
                return
            else:
                raise IOError(lib.mbx_stream_error(stream).decode("utf-8"))
    finally:
        lib.mbx_stream_close(stream)


def decode_jpeg(data: bytes, canvas: Optional[int] = None) -> np.ndarray:
    """Decode (+resize) via libjpeg. Returns RGB uint8 [H, W, 3]."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built")
    h = ctypes.c_int()
    w = ctypes.c_int()
    errbuf = ctypes.create_string_buffer(256)
    ptr = lib.mbx_decode_jpeg(
        data, len(data), canvas or 0, ctypes.byref(h), ctypes.byref(w),
        errbuf, len(errbuf),
    )
    if not ptr:
        raise ValueError(f"jpeg decode failed: {errbuf.value.decode()}")
    try:
        n = h.value * w.value * 3
        out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.mbx_free_image(ptr)
    return out.reshape(h.value, w.value, 3)
