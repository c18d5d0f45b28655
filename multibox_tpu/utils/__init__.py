"""Utilities: checkpointing, metrics, debugging toggles."""
