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


def __getattr__(name):
    """Lazy top-level API (keeps bare `import multibox_tpu` cheap)."""
    if name == "Config":
        from multibox_tpu.config import Config

        return Config
    if name == "parse_config_file":
        from multibox_tpu.config import parse_config_file

        return parse_config_file
    if name == "build_model":
        from multibox_tpu.inference import build_model

        return build_model
    if name == "make_detect_fn":
        from multibox_tpu.inference import make_detect_fn

        return make_detect_fn
    if name == "load_exported":
        from multibox_tpu.serving import load_exported

        return load_exported
    raise AttributeError(f"module 'multibox_tpu' has no attribute {name!r}")


__all__ = [
    "__version__",
    "Config",
    "parse_config_file",
    "build_model",
    "make_detect_fn",
    "load_exported",
]
