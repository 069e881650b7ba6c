"""Pallas TPU kernels for the attention hot paths."""

from .attention import flash_attention, use_pallas

__all__ = ["flash_attention", "use_pallas"]
