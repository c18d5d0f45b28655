"""Pallas TPU kernels for the detection hot paths.

Each kernel has a jnp reference implementation elsewhere in
``multibox_tpu.ops`` that defines its semantics; kernels are tested in
interpret mode against those references (SURVEY.md §4).
"""
