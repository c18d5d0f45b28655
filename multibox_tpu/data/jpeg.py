"""Host-side JPEG decode behind a single API.

The decode itself is entropy-coded and branch-heavy — the one stage of the
pipeline that stays on the host CPU (native libjpeg-turbo via PIL, or the
C++ helper in ``multibox_tpu/native``); everything downstream (resize,
augment, normalize) runs on-device (``multibox_tpu.data.augment``).

``decode_jpeg`` optionally resizes to a fixed host canvas so batches have
static shapes before device transfer; normalized box coordinates are
resize-invariant so labels need no adjustment.
"""

from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np


def decode_jpeg(
    data: bytes,
    canvas: Optional[int] = None,
    backend: str = "auto",
    draft: bool = False,
) -> np.ndarray:
    """JPEG bytes → RGB uint8 array ``[H, W, 3]`` (or ``[canvas, canvas, 3]``).

    backend:
      "auto"/"pil" — PIL (libjpeg-turbo), the production path; "auto"
        never silently switches implementation based on optional builds.
      "native" — explicit opt-in to the C++ decoder (DCT-scaled decode +
        plain-bilinear canvas resize; raises if the .so isn't built).
      "tf" — golden parity tests only.

    draft: with a ``canvas``, enable libjpeg DCT-scaled decode (PIL draft
      mode): the image is decoded directly at the nearest ≥canvas power-of-
      two fraction (1/2, 1/4, 1/8) by reading fewer DCT blocks, then
      bilinear-resized to the canvas. Large decode speedup when source
      images are much bigger than the canvas (typical photos); pixels
      differ slightly from the full-decode path, so this is a TRAINING
      input option, not for eval/golden parity.
    """
    if backend == "tf":
        import tensorflow as tf

        img = tf.io.decode_jpeg(data, channels=3).numpy()
        if canvas is not None:
            img = _resize_np(img, canvas)
        return img
    if backend == "native":
        # Explicit opt-in only: the native resize is plain bilinear while
        # PIL antialiases, so "auto" must not silently change pixels based
        # on whether the optional .so was built. PIL (libjpeg-turbo) is
        # also the faster single-thread decoder on this class of host.
        from multibox_tpu.data import _native

        return _native.decode_jpeg(data, canvas)
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if draft and canvas is not None:
        img.draft("RGB", (canvas, canvas))
    img = img.convert("RGB")
    if canvas is not None:
        img = img.resize((canvas, canvas), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def encode_jpeg(image: np.ndarray, quality: int = 95) -> bytes:
    """RGB uint8 array → JPEG bytes (fixtures, dataset-builder CLI)."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _resize_np(img: np.ndarray, canvas: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((canvas, canvas), Image.BILINEAR),
        dtype=np.uint8,
    )
