"""Pallas TPU kernels for the hot solver ops (interpret-mode on CPU)."""

from . import chol  # noqa: F401
