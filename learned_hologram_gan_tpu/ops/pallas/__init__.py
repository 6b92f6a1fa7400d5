"""Pallas TPU kernels for the spectral hot path."""

from .transfer import apply_transfer_stack, apply_transfer_stack_reference

__all__ = ["apply_transfer_stack", "apply_transfer_stack_reference"]
