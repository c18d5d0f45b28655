"""multibox_tpu — a TPU-native (JAX/XLA/Pallas/pjit) MultiBox detection framework.

Re-implementation (from scratch, TPU-first) of the capabilities of the
reference detection stack ``gvanhorn38/multibox`` (Szegedy et al.,
arXiv:1412.1441 "Scalable, High-Quality Object Detection"; Erhan et al.,
CVPR'14 arXiv:1312.2249 "Scalable Object Detection using Deep Neural
Networks"), per SURVEY.md.

Layout
------
- ``multibox_tpu.ops``      — box geometry, bipartite matching, NMS (jnp + Pallas)
- ``multibox_tpu.priors``   — prior-box generation (k-means over gt boxes)
- ``multibox_tpu.models``   — Inception-v3 backbone (flax) + MultiBox heads
- ``multibox_tpu.data``     — tfrecord input pipeline, on-device augmentation
- ``multibox_tpu.train``    — MultiBox loss, train state (EMA), train loop
- ``multibox_tpu.parallel`` — mesh / sharding helpers (data-parallel over ICI)
- ``multibox_tpu.inference``— detect pipeline (forward → decode → NMS → top-k)
- ``multibox_tpu.evaluate`` — detection metrics (mAP / PR)
- ``multibox_tpu.cli``      — train / detect / eval / export / visualize entry points
"""

from multibox_tpu.version import __version__

__all__ = ["__version__"]
