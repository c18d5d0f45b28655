"""Input pipeline: tfrecord reading, JPEG decode, on-device augmentation.

Replaces the reference's TF queue-runner input graph (ref:inputs.py,
SURVEY.md §2 C3): the host side reads tfrecords and decodes JPEGs (native
libjpeg via PIL, or the optional C++ reader); everything else — crop,
flip, color distortion, resize, normalization — runs on-device inside the
jitted train/detect step (``multibox_tpu.data.augment``).
"""

from multibox_tpu.data.tfrecord import TFRecordReader, TFRecordWriter, read_records
from multibox_tpu.data.example_proto import (
    parse_example,
    build_example,
    parse_detection_example,
    build_detection_example,
)
from multibox_tpu.data.pipeline import DetectionDataset, pad_boxes

__all__ = [
    "TFRecordReader",
    "TFRecordWriter",
    "read_records",
    "parse_example",
    "build_example",
    "parse_detection_example",
    "build_detection_example",
    "DetectionDataset",
    "pad_boxes",
]
