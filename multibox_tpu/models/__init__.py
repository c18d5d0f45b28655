"""Model zoo: Inception-v3 backbone (flax) + MultiBox / SSD-style heads."""

from multibox_tpu.models.inception_v3 import InceptionV3
from multibox_tpu.models.heads import MultiBoxHead, SSDHead
from multibox_tpu.models.detector import MultiBoxDetector

__all__ = ["InceptionV3", "MultiBoxHead", "SSDHead", "MultiBoxDetector"]
