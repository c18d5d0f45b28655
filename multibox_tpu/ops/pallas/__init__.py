"""Pallas TPU kernels for the detection hot paths.

Each kernel has a jnp reference implementation elsewhere in
``multibox_tpu.ops`` that defines its semantics; kernels are tested in
interpret mode against those references (SURVEY.md §4).
"""

import jax


def should_interpret(explicit=None) -> bool:
    """Pallas TPU kernels need ``interpret=True`` everywhere except a real
    TPU backend (CPU tests, fake meshes)."""
    if explicit is not None:
        return explicit
    return jax.default_backend() != "tpu"


def resolve_use_pallas(flag) -> bool:
    """Resolve a config ``use_pallas`` value: None = auto (kernels on a
    real TPU backend, jnp fallbacks elsewhere)."""
    if flag is None:
        return jax.default_backend() == "tpu"
    return bool(flag)
