"""Small utilities: normalizers, timing, plotting, metric-history plumbing."""

from .normalize import amplitude_normalizor, tensor_normalizor_2d
from .timer import device_timer

__all__ = [
    "amplitude_normalizor",
    "tensor_normalizor_2d",
    "device_timer",
]
